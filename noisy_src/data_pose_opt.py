from robust_nerf_tpu.data.banks import (  # noqa: F401
    PixelBank,
    build_pixel_bank,
    sample_pixel_batch,
)
from noisy_src.compat import (  # noqa: F401,E402
    PixelBatch,
    PixelDataset,
    PixelSampler,
    create_pixel_dataset,
)
