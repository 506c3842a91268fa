from robust_nerf_tpu.ops.rendering import (  # noqa: F401
    raw2outputs,
    render_image,
    render_rays,
    render_rays_chunked,
)
from noisy_src.compat import NeRFRenderer  # noqa: F401,E402
