"""`python -m noisy_src.train` — reference entry point (train.py:580-698),
backed by the TPU-native implementation."""

from robust_nerf_tpu.training.train import (  # noqa: F401
    build_config_from_args,
    generate_experiment_name,
    main,
    train,
)

if __name__ == "__main__":
    main()
