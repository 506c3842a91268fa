"""`python -m noisy_src.train_pose_opt` — reference entry point
(train_pose_opt.py:1057-1192), backed by the TPU-native implementation."""

from robust_nerf_tpu.training.train_pose_opt import (  # noqa: F401
    generate_experiment_name,
    main,
    train_with_pose_optimization,
)
from robust_nerf_tpu.training.checkpoints import (  # noqa: F401
    save_checkpoint as save_checkpoint_with_poses,
)
from robust_nerf_tpu.training.evaluation import (  # noqa: F401
    evaluate as evaluate_with_poses,
)
from noisy_src.compat import (  # noqa: F401,E402
    CameraPoseParameters,
    render_image_with_pose,
    set_seed,
    train_step_with_poses,
)

if __name__ == "__main__":
    main()
