"""`noisy_src.utils` — reference utility-module surface
(noisy_src/utils.py:13-252), backed by the TPU-native implementation.

The reference module held legacy duplicates of PSNR/SSIM (utils.py:13-77 —
an older PSNR and a global-stats *approximation* of SSIM); here both names
resolve to the production metrics (real 11x11 windowed SSIM), which is a
strict upgrade with the same call signature. `create_spiral_poses` is the
height-varying spiral variant (utils.py:124-192), distinct from
`noisy_src.inference.create_spiral_poses`'s circular orbit — same split as
the reference. `AverageMeter`/`EarlyStopping` (utils.py:195-252) are
provided for API completeness (the reference defined but never used them).
"""

from robust_nerf_tpu.evalx.inference import (  # noqa: F401
    create_spiral_path_poses as create_spiral_poses,
)
from robust_nerf_tpu.evalx.metrics import (  # noqa: F401
    compute_psnr,
    compute_ssim,
)
from robust_nerf_tpu.utils.logger import depth_to_colormap  # noqa: F401
from robust_nerf_tpu.utils.train_utils import (  # noqa: F401
    AverageMeter,
    EarlyStopping,
)
