from robust_nerf_tpu.models.nerf import (  # noqa: F401
    create_nerf,
    init_nerf_params,
    nerf_apply,
    positional_encoding,
)
from noisy_src.compat import NeRF, PositionalEncoding  # noqa: F401,E402
