"""`python -m noisy_src.inference` — reference entry point
(inference.py:446-612), backed by the TPU-native implementation."""

from robust_nerf_tpu.evalx.inference import (  # noqa: F401
    create_spiral_poses,
    evaluate_test_set,
    load_checkpoint,
    main,
    render_video,
)

if __name__ == "__main__":
    main()
