from robust_nerf_tpu.core.rays import (  # noqa: F401
    get_ray_directions,
    get_rays,
    get_rays_batch,
    sample_along_rays,
    sample_hierarchical,
    sample_pdf,
)
