"""Robust-NeRF on TPU — a TPU-native (JAX/XLA/Pallas) rebuild of the
Robust-NeRF reference (camera-pose-noise-robust NeRF with joint SE(3)
pose optimization).

Public API mirrors the reference package re-exports
(reference: noisy_src/__init__.py:10-66).
"""

from .config import (
    ModelConfig,
    RenderConfig,
    DataConfig,
    TrainConfig,
    PoseOptConfig,
    TPUConfig,
    NeRFConfig,
    config_to_dict,
    config_from_dict,
)
from .core.rays import (
    get_ray_directions,
    get_rays,
    get_rays_batch,
    get_rays_for_pixels,
    sample_along_rays,
    sample_pdf,
    sample_hierarchical,
)
from .core.se3 import (
    exp_so3,
    log_so3,
    skew,
    apply_pose_deltas,
    align_poses_umeyama,
    pose_errors,
    rotation_geodesic_error_deg,
)
from .core.noise import (
    NoiseConfig,
    add_noise_to_pose,
    add_noise_to_poses,
    compute_pose_error,
    random_rotation_matrix,
)
from .models.nerf import (
    positional_encoding,
    posenc_output_dim,
    freq_anneal_weights,
    init_nerf_params,
    nerf_apply,
    create_nerf,
    count_params,
)
from .ops.rendering import (
    raw2outputs,
    render_rays,
    render_rays_chunked,
    render_image,
)
from .data.blender import SceneData, load_blender_data
from .data.synthetic import (
    SYNTHETIC_SCENES,
    analytic_field,
    load_scene,
    make_synthetic_scene,
    pose_spherical,
    scene_params,
)
from .data.banks import (
    RayBank,
    PixelBank,
    build_ray_bank,
    build_pixel_bank,
    sample_ray_batch,
    sample_pixel_batch,
    shard_bank,
    make_sharded_ray_sampler,
    make_sharded_pixel_sampler,
)

__version__ = "0.1.0"

from .evalx.metrics import (
    LPIPSMetric,
    compute_all_metrics,
    compute_mse,
    compute_ms_ssim,
    compute_psnr,
    compute_ssim,
)
from .utils.logger import (
    CSVLogger,
    ExperimentLogger,
    TensorBoardLogger,
    TrainingMetrics,
    ValidationMetrics,
    depth_to_colormap,
)
from .utils.train_utils import AverageMeter, EarlyStopping
