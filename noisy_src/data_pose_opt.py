from robust_nerf_tpu.data.banks import (  # noqa: F401
    PixelBank,
    build_pixel_bank,
    sample_pixel_batch,
)
