"""noisy_src — reference-compatible API surface for Robust-NeRF on TPU.

Users of the reference package (ShawnnnLiu/Robust-NeRF `noisy_src`) can keep
their imports and CLI invocations; every symbol resolves to the TPU-native
implementation in `robust_nerf_tpu`. Re-export list mirrors the reference
(noisy_src/__init__.py:10-66).
"""

from robust_nerf_tpu.config import (
    ModelConfig,
    RenderConfig,
    DataConfig,
    TrainConfig,
    PoseOptConfig,
    NeRFConfig,
)
from robust_nerf_tpu.models.nerf import (
    positional_encoding,
    init_nerf_params,
    nerf_apply,
    create_nerf,
)
from robust_nerf_tpu.ops.rendering import (
    raw2outputs,
    render_rays,
    render_rays_chunked,
    render_image,
)
from robust_nerf_tpu.core.rays import (
    get_ray_directions,
    get_rays,
    get_rays_batch,
    sample_along_rays,
    sample_pdf,
    sample_hierarchical,
)
from robust_nerf_tpu.data.blender import SceneData, load_blender_data
from robust_nerf_tpu.data.banks import (
    RayBank,
    PixelBank,
    build_ray_bank,
    build_pixel_bank,
    sample_ray_batch,
    sample_pixel_batch,
)
from robust_nerf_tpu.core.noise import (
    NoiseConfig,
    add_noise_to_pose,
    add_noise_to_poses,
    compute_pose_error,
    random_rotation_matrix,
)
from robust_nerf_tpu.evalx.metrics import (
    compute_psnr,
    compute_mse,
    compute_ssim,
    compute_all_metrics,
    LPIPSMetric,
)
from robust_nerf_tpu.utils.logger import (
    ExperimentLogger,
    TrainingMetrics,
    ValidationMetrics,
)
from robust_nerf_tpu.training.train import train
from robust_nerf_tpu.training.train_pose_opt import train_with_pose_optimization

# BlenderData is the reference's name for the loaded-scene container
BlenderData = SceneData

# reference-named class wrappers over the functional core
from noisy_src.compat import (
    NeRF,
    NeRFRenderer,
    PositionalEncoding,
    PixelDataset,
    PixelSampler,
    RayDataset,
    RaySampler,
    create_data_loaders,
    create_pixel_dataset,
)
