from robust_nerf_tpu.utils.logger import (  # noqa: F401
    CSVLogger,
    ExperimentLogger,
    TensorBoardLogger,
    TrainingMetrics,
    ValidationMetrics,
)
from robust_nerf_tpu.utils.visualize import (  # noqa: F401
    create_comparison_plot,
)
