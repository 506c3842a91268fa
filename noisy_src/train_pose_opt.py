"""`python -m noisy_src.train_pose_opt` — reference entry point
(train_pose_opt.py:1057-1192), backed by the TPU-native implementation."""

from robust_nerf_tpu.training.train_pose_opt import (  # noqa: F401
    generate_experiment_name,
    main,
    train_with_pose_optimization,
)

if __name__ == "__main__":
    main()
