from robust_nerf_tpu.core.noise import (  # noqa: F401
    NoiseConfig,
    add_noise_to_pose,
    add_noise_to_poses,
    compute_pose_error,
    random_rotation_matrix,
    random_translation,
    set_noise_seed,
)
