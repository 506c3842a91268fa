from robust_nerf_tpu.utils.logger import (  # noqa: F401
    CSVLogger,
    ExperimentLogger,
    TensorBoardLogger,
    TrainingMetrics,
    ValidationMetrics,
)
