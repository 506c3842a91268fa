"""`python -m noisy_src.inference` — reference entry point
(inference.py:446-612), backed by the TPU-native implementation."""

from robust_nerf_tpu.evalx.inference import (  # noqa: F401
    create_spiral_poses,
    evaluate_test_set,
    load_checkpoint,
    main,
    render_video,
)
from robust_nerf_tpu.utils.logger import (  # noqa: F401
    depth_to_colormap,
)
from robust_nerf_tpu.utils.logger import save_png as save_image  # noqa: F401
from noisy_src.compat import (  # noqa: F401,E402
    generate_output_folder_name,
    render_image,
)

if __name__ == "__main__":
    main()
