from robust_nerf_tpu.evalx.metrics import (  # noqa: F401
    LPIPSMetric,
    compute_all_metrics,
    compute_mse,
    compute_ms_ssim,
    compute_psnr,
    compute_ssim,
)
