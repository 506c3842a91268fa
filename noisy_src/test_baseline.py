"""Assert-based smoke tests, runnable as `python -m noisy_src.test_baseline`.

Behavioral parity with the reference smoke module
(noisy_src/test_baseline.py:12-212); the full pytest suite in tests/ is the
real test surface — this module exists for CLI parity.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def test_model():
    from robust_nerf_tpu.config import ModelConfig
    from robust_nerf_tpu.models.nerf import (
        create_nerf, init_nerf_params, nerf_apply, positional_encoding,
    )

    cfg = ModelConfig()
    x = jnp.zeros((4, 3))
    assert positional_encoding(x, 10).shape == (4, 63)   # 3*(1+2*10)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (1024, 3), minval=-1, maxval=1)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (1024, 1))
    rgb, sigma = nerf_apply(params, pts, dirs, cfg)
    assert rgb.shape == (1024, 3) and sigma.shape == (1024, 1)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
    assert float(sigma.min()) >= 0.0
    models = create_nerf(jax.random.PRNGKey(0))
    assert "coarse" in models and "fine" in models
    print("  model OK")


def test_rays():
    from robust_nerf_tpu.core.rays import (
        get_ray_directions, get_rays, sample_along_rays, sample_hierarchical,
    )

    H, W = 40, 40
    dirs = get_ray_directions(H, W, 50.0)
    assert dirs.shape == (H, W, 3)
    pose = jnp.eye(4).at[2, 3].set(4.0)
    ro, rd = get_rays(dirs, pose)
    assert ro.shape == (H, W, 3)
    ro_f, rd_f = ro.reshape(-1, 3)[:100], rd.reshape(-1, 3)[:100]
    pts, z = sample_along_rays(None, ro_f, rd_f, 2.0, 6.0, 64, perturb=False)
    assert pts.shape == (100, 64, 3)
    w = jax.random.uniform(jax.random.PRNGKey(0), (100, 64))
    _, z_fine = sample_hierarchical(jax.random.PRNGKey(0), ro_f, rd_f, z, w, 128)
    assert z_fine.shape == (100, 192)   # 64 + 128
    print("  rays OK")


def test_rendering():
    from robust_nerf_tpu.config import ModelConfig, RenderConfig
    from robust_nerf_tpu.models.nerf import create_nerf
    from robust_nerf_tpu.ops.rendering import raw2outputs, render_rays_chunked

    N, S = 64, 64
    out = raw2outputs(
        jnp.ones((N, S, 3)) * 0.5, jnp.ones((N, S)),
        jnp.broadcast_to(jnp.linspace(2, 6, S), (N, S)), jnp.ones((N, 3)),
    )
    assert out["weights"].shape == (N, S)
    models = create_nerf(jax.random.PRNGKey(0))
    ro = jnp.zeros((60, 3)).at[:, 2].set(4.0)
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (60, 1))
    res = render_rays_chunked(
        models, ro, rd, None, RenderConfig(num_samples=16, num_samples_fine=16),
        ModelConfig(), is_train=False, tile=25,   # force multi-chunk path
    )
    assert res["rgb_fine"].shape == (60, 3)
    print("  rendering OK")


def test_data_loading():
    from pathlib import Path

    from robust_nerf_tpu.data.blender import load_blender_data

    data_root = Path("data/raw")
    if not data_root.exists():
        print("  data loading SKIPPED (data/raw absent)")
        return
    data = load_blender_data(data_root, "chair", "train", img_scale=0.25)
    assert data.images.ndim == 4
    print("  data loading OK")


def main():
    tests = [test_model, test_rays, test_rendering, test_data_loading]
    failed = 0
    for t in tests:
        try:
            t()
        except Exception as e:
            print(f"  {t.__name__} FAILED: {e}")
            failed += 1
    if failed:
        sys.exit(1)
    print("All baseline smoke tests passed")


if __name__ == "__main__":
    main()
