from robust_nerf_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    NeRFConfig,
    PoseOptConfig,
    RenderConfig,
    TrainConfig,
)
