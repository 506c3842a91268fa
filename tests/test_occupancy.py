"""Density-grid accelerated rendering (ops/occupancy.py).

Quality is checked against an ORACLE model — the synthetic scene's analytic
field (data/synthetic.py:analytic_field) plugged in as an apply_fn — so the
grid-guided renderer is compared to ground truth and to the standard
coarse->fine renderer without any training in the loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.config import ModelConfig, RenderConfig, TPUConfig
from robust_nerf_tpu.data.synthetic import analytic_field, make_synthetic_scene
from robust_nerf_tpu.evalx.metrics import compute_psnr
from robust_nerf_tpu.models.nerf import model_apply_fn
from robust_nerf_tpu.ops.occupancy import (
    OccConfig,
    build_density_grid,
    grid_trilinear,
    occgrid_weights,
    render_image_occ,
    render_rays_occgrid,
)


def oracle_apply(params, pts, viewdirs, cfg, compute_dtype=jnp.float32,
                 anneal_alpha=None, f8_residuals=False):
    """analytic_field with the nerf_apply signature (exact scene density)."""
    del params, viewdirs, compute_dtype, anneal_alpha, f8_residuals
    rgb, sigma = analytic_field(pts, textured=False)
    return rgb, sigma[..., None]


ORACLE_MODELS = {"coarse": {}, "fine": {}}
# cameras orbit at radius 4; blobs live within |x| < ~1 (data/synthetic.py)
ORACLE_MCFG = ModelConfig(scene_bound=1.5)


class TestGridTrilinear:
    def test_vertices_exact(self):
        grid = jnp.asarray(np.random.default_rng(0).normal(size=(5, 5, 5)),
                           jnp.float32)
        ks = np.array([[0, 0, 0], [4, 4, 4], [1, 3, 2], [0, 4, 2]])
        # x01 vertex k sits at k/(R-1); index order is (x, y, z)
        q = jnp.asarray(ks / 4.0, jnp.float32)
        got = grid_trilinear(grid, q)
        want = jnp.asarray([grid[z, y, x] for x, y, z in ks])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_midpoint_is_average(self):
        grid = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4, 4)),
                           jnp.float32)
        q = jnp.array([[0.5 / 3.0, 0.0, 0.0]], jnp.float32)  # between x=0,1
        got = float(grid_trilinear(grid, q)[0])
        want = 0.5 * (float(grid[0, 0, 0]) + float(grid[0, 0, 1]))
        assert abs(got - want) < 1e-6

    def test_boundary_clamped(self):
        grid = jnp.ones((4, 4, 4), jnp.float32)
        got = grid_trilinear(grid, jnp.array([[1.0, 1.0, 1.0]], jnp.float32))
        np.testing.assert_allclose(np.asarray(got), 1.0, atol=1e-6)

    def test_leading_shape_preserved(self):
        grid = jnp.zeros((4, 4, 4), jnp.float32)
        out = grid_trilinear(grid, jnp.zeros((2, 7, 3), jnp.float32))
        assert out.shape == (2, 7)


class TestBuildDensityGrid:
    def test_matches_direct_eval_at_vertices(self):
        """Lattice entries ARE the model's density at the vertex points."""
        cfg = ModelConfig(hidden_dim=16, num_hidden_layers=2, skips=(),
                          pos_freqs=2, dir_freqs=1)
        from robust_nerf_tpu.models.nerf import create_nerf

        models = create_nerf(jax.random.PRNGKey(0), cfg, use_hierarchical=True)
        R = 7
        grid = build_density_grid(
            models, cfg, OccConfig(resolution=R, dilate=0)
        )
        assert grid.shape == (R, R, R)
        b = cfg.scene_bound
        coords = np.linspace(-b, b, R).astype(np.float32)
        apply_fn = model_apply_fn(cfg)
        rng = np.random.default_rng(2)
        for _ in range(5):
            ix, iy, iz = rng.integers(0, R, size=3)
            pt = jnp.array([[coords[ix], coords[iy], coords[iz]]])
            _, sigma = apply_fn(models["fine"], pt, jnp.zeros_like(pt), cfg, jnp.float32)
            assert abs(float(grid[iz, iy, ix]) - float(sigma[0, 0])) < 1e-4

    def test_dilate_is_conservative(self):
        grid0 = build_density_grid(
            ORACLE_MODELS, ORACLE_MCFG, OccConfig(resolution=24, dilate=0),
            apply_fn=oracle_apply,
        )
        grid1 = build_density_grid(
            ORACLE_MODELS, ORACLE_MCFG, OccConfig(resolution=24, dilate=1),
            apply_fn=oracle_apply,
        )
        assert np.all(np.asarray(grid1) >= np.asarray(grid0) - 1e-6)
        assert float(grid1.sum()) > float(grid0.sum())

    def test_which_selects_model(self):
        """'coarse' and 'fine' grids differ when the params differ."""
        cfg = ModelConfig(hidden_dim=16, num_hidden_layers=2, skips=(),
                          pos_freqs=2, dir_freqs=1)
        from robust_nerf_tpu.models.nerf import create_nerf

        models = create_nerf(jax.random.PRNGKey(3), cfg, use_hierarchical=True)
        g_f = build_density_grid(models, cfg, OccConfig(resolution=5, dilate=0))
        g_c = build_density_grid(models, cfg, OccConfig(resolution=5, dilate=0),
                                 which="coarse")
        assert not np.allclose(np.asarray(g_f), np.asarray(g_c))


class TestOccgridWeights:
    def test_weights_concentrate_on_slab(self):
        """Density only in a z-slab -> ray weights peak at the slab depth."""
        R = 33
        grid = np.zeros((R, R, R), np.float32)
        grid[14:19] = 50.0          # z indices 14..18 of 33 -> z ~ [-0.1, 0.1]
        grid = jnp.asarray(grid)
        rays_o = jnp.array([[0.0, 0.0, -4.0]])
        rays_d = jnp.array([[0.0, 0.0, 1.0]])
        weights, z_vals = occgrid_weights(
            grid, rays_o, rays_d, near=2.0, far=6.0, num_probes=64, bound=1.0
        )
        assert weights.shape == (1, 64)
        peak_z = float(z_vals[0, jnp.argmax(weights[0])])
        # slab center at world z=0 is depth 4.0 along this ray
        assert abs(peak_z - 4.0) < 0.2
        assert float(weights.sum()) > 0.5

    def test_miss_is_empty(self):
        grid = jnp.full((9, 9, 9), 100.0, jnp.float32)
        rays_o = jnp.array([[5.0, 5.0, -4.0]])   # passes far outside the AABB
        rays_d = jnp.array([[0.0, 0.0, 1.0]])
        weights, _ = occgrid_weights(
            grid, rays_o, rays_d, near=2.0, far=6.0, num_probes=32, bound=1.0
        )
        assert float(weights.sum()) < 1e-6


class TestOccRenderQuality:
    @pytest.fixture(scope="class")
    def scene(self):
        return make_synthetic_scene(num_images=2, resolution=32, split="val",
                                    num_samples=128)

    @pytest.fixture(scope="class")
    def oracle_grid(self):
        return build_density_grid(
            ORACLE_MODELS, ORACLE_MCFG, OccConfig(resolution=96, dilate=1),
            apply_fn=oracle_apply,
        )

    def test_matches_gt_and_standard_renderer(self, scene, oracle_grid):
        """Grid-guided render of the exact field ~ GT image, and within
        ~1 dB of the standard coarse->fine render of the same field."""
        from robust_nerf_tpu.core.rays import get_ray_directions, get_rays
        from robust_nerf_tpu.ops.rendering import render_rays

        rcfg = RenderConfig(num_samples=64, num_samples_fine=128)
        directions = get_ray_directions(scene.H, scene.W, scene.focal)
        rays_o, rays_d = get_rays(directions, scene.poses[0])
        ro, rd = rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)

        occ_out = render_rays_occgrid(
            ORACLE_MODELS, ro, rd, None, rcfg, ORACLE_MCFG,
            oracle_grid, OccConfig(num_probes=64), is_train=False,
            apply_fn=oracle_apply,
        )
        std_out = render_rays(
            ORACLE_MODELS, ro, rd, None, rcfg, ORACLE_MCFG,
            is_train=False, apply_fn=oracle_apply,
        )
        gt = np.asarray(scene.images[0])
        occ_img = np.asarray(occ_out["rgb_fine"]).reshape(scene.H, scene.W, 3)
        std_img = np.asarray(std_out["rgb_fine"]).reshape(scene.H, scene.W, 3)
        psnr_occ = float(compute_psnr(occ_img, gt))
        psnr_std = float(compute_psnr(std_img, gt))
        assert psnr_occ > 45.0, f"occ render too far from GT: {psnr_occ:.2f} dB"
        assert psnr_occ > psnr_std - 2.0, (
            f"occ {psnr_occ:.2f} dB vs standard {psnr_std:.2f} dB"
        )

    def test_reduced_sample_budget_holds_up(self, scene, oracle_grid):
        """With HALF the model evals (128 vs 64+192=256) the grid-guided
        render still tracks GT — the 2x-fewer-evals serving mode."""
        from robust_nerf_tpu.core.rays import get_ray_directions, get_rays

        rcfg = RenderConfig(num_samples=64, num_samples_fine=128)
        directions = get_ray_directions(scene.H, scene.W, scene.focal)
        rays_o, rays_d = get_rays(directions, scene.poses[1])
        out = render_rays_occgrid(
            ORACLE_MODELS, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3),
            None, rcfg, ORACLE_MCFG, oracle_grid,
            OccConfig(num_probes=64, num_samples=128), is_train=False,
            apply_fn=oracle_apply,
        )
        img = np.asarray(out["rgb_fine"]).reshape(scene.H, scene.W, 3)
        psnr = float(compute_psnr(img, np.asarray(scene.images[1])))
        assert psnr > 45.0, f"128-sample occ render: {psnr:.2f} dB"


class TestRenderImageOcc:
    def test_end_to_end_jitted(self):
        """Full-frame path: unaligned H*W, tiled, finite, right shapes."""
        cfg = ModelConfig(hidden_dim=16, num_hidden_layers=2, skips=(),
                          pos_freqs=2, dir_freqs=1)
        from robust_nerf_tpu.models.nerf import create_nerf

        models = create_nerf(jax.random.PRNGKey(0), cfg, use_hierarchical=True)
        grid = build_density_grid(models, cfg, OccConfig(resolution=9))
        rcfg = RenderConfig(num_samples=8, num_samples_fine=8)
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 4.0
        out = render_image_occ(
            models, grid, pose, 9, 7, 10.0, rcfg, cfg,
            TPUConfig(eval_tile=16), OccConfig(resolution=9, num_probes=8),
        )
        assert out["rgb"].shape == (9, 7, 3)
        assert out["depth"].shape == (9, 7)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))


class TestInferenceCLI:
    def test_occ_grid_flag(self, tmp_path):
        """--occ_grid end to end: train tiny, then test-mode eval through
        the grid path writes the same artifact set."""
        import json

        from robust_nerf_tpu.evalx.inference import main as infer_main
        from robust_nerf_tpu.training.train import main as train_main

        out = tmp_path / "runs"
        train_main([
            "--data_source", "synthetic", "--num_iters", "40",
            "--val_every", "40", "--save_every", "40", "--log_every", "20",
            "--batch_size", "128", "--num_samples", "8",
            "--num_samples_fine", "8", "--steps_per_scan", "20",
            "--output_dir", str(out), "--exp_name", "occrun",
        ])
        infer_main([
            "--checkpoint", str(out / "occrun"), "--mode", "test",
            "--split", "val", "--max_images", "1",
            "--data_source", "synthetic",
            "--occ_grid", "16", "--occ_probes", "8", "--occ_samples", "8",
            "--output_dir", str(tmp_path / "occ_infer"),
        ])
        metrics = json.loads(
            (tmp_path / "occ_infer" / "test_metrics.json").read_text()
        )
        assert metrics["num_images"] == 1
        assert np.isfinite(metrics["psnr_mean"])
