"""`python -m noisy_src.train` — reference entry point (train.py:580-698),
backed by the TPU-native implementation."""

from robust_nerf_tpu.training.train import (  # noqa: F401
    build_config_from_args,
    generate_experiment_name,
    main,
    train,
)
from robust_nerf_tpu.training.checkpoints import (  # noqa: F401
    find_checkpoint,
    load_checkpoint_raw,
    restore_into,
    save_checkpoint,
)
from robust_nerf_tpu.training.evaluation import evaluate  # noqa: F401
from robust_nerf_tpu.evalx.inference import load_checkpoint  # noqa: F401
from noisy_src.compat import (  # noqa: F401,E402
    render_image,
    set_seed,
    train_step,
)

if __name__ == "__main__":
    main()
