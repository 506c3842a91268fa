from robust_nerf_tpu.data.banks import (  # noqa: F401
    RayBank,
    build_ray_bank,
    sample_ray_batch,
)
from robust_nerf_tpu.data.blender import SceneData, load_blender_data  # noqa: F401

BlenderData = SceneData
from noisy_src.compat import (  # noqa: F401,E402
    RayDataset,
    RaySampler,
    create_data_loaders,
)
