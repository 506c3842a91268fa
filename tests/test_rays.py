"""Geometry core tests — ray generation and along-ray sampling.

Ports + extends the reference smoke checks (noisy_src/test_baseline.py:51-97)
as real pytest units with golden values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.core.rays import (
    get_ray_directions,
    get_rays,
    get_rays_batch,
    get_rays_for_pixels,
    sample_along_rays,
    sample_hierarchical,
    sample_pdf,
)


class TestRayDirections:
    def test_shape(self):
        dirs = get_ray_directions(32, 48, 50.0)
        assert dirs.shape == (32, 48, 3)

    def test_opengl_convention(self):
        """Camera looks down -Z; +x pixels right, +y pixels down -> -y dir."""
        H = W = 4
        dirs = np.asarray(get_ray_directions(H, W, 10.0))
        assert np.all(dirs[..., 2] == -1.0)
        # column index increases -> x component increases
        assert dirs[0, 3, 0] > dirs[0, 0, 0]
        # row index increases -> y component decreases (y flipped)
        assert dirs[3, 0, 1] < dirs[0, 0, 1]

    def test_center_pixel_near_axis(self):
        dirs = np.asarray(get_ray_directions(100, 100, 100.0))
        # principal point at W/2: pixel (50,50) direction = ((50.5-50)/f..) tiny
        assert abs(dirs[50, 50, 0]) < 0.01
        assert abs(dirs[50, 50, 1]) < 0.01

    def test_custom_center(self):
        dirs = np.asarray(get_ray_directions(8, 8, 10.0, center=(0.0, 0.0)))
        assert dirs[0, 0, 0] == 0.0
        assert dirs[0, 0, 1] == 0.0


class TestGetRays:
    def test_identity_pose(self):
        """Identity c2w at origin: world rays == normalized camera dirs."""
        dirs = get_ray_directions(8, 8, 10.0)
        rays_o, rays_d = get_rays(dirs, jnp.eye(4))
        assert np.allclose(np.asarray(rays_o), 0.0)
        norms = np.linalg.norm(np.asarray(rays_d), axis=-1)
        assert np.allclose(norms, 1.0, atol=1e-5)

    def test_translated_pose(self):
        c2w = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 4.0]))
        dirs = get_ray_directions(4, 4, 10.0)
        rays_o, rays_d = get_rays(dirs, c2w)
        assert np.allclose(np.asarray(rays_o), [1.0, 2.0, 4.0])

    def test_rotation_applied(self):
        """180-deg rotation about x flips y and z of directions."""
        R = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0]))
        dirs = get_ray_directions(4, 4, 10.0)
        _, rd_rot = get_rays(dirs, R)
        _, rd_id = get_rays(dirs, jnp.eye(4))
        np.testing.assert_allclose(
            np.asarray(rd_rot[..., 1:]), -np.asarray(rd_id[..., 1:]), atol=1e-6
        )

    def test_batch_matches_single(self):
        poses = jnp.stack([jnp.eye(4), jnp.eye(4).at[:3, 3].set(1.0)])
        ro_b, rd_b = get_rays_batch(4, 4, 10.0, poses)
        assert ro_b.shape == (2, 4, 4, 3)
        dirs = get_ray_directions(4, 4, 10.0)
        ro0, rd0 = get_rays(dirs, poses[0])
        np.testing.assert_allclose(np.asarray(rd_b[0]), np.asarray(rd0), atol=1e-6)

    def test_pixel_rays_match_grid(self):
        """get_rays_for_pixels must agree with the full-grid path."""
        H, W, f = 6, 6, 8.0
        pose = jnp.eye(4).at[:3, 3].set(jnp.array([0.0, 0.0, 4.0]))
        dirs = get_ray_directions(H, W, f)
        ro_full, rd_full = get_rays(dirs, pose)
        us = jnp.array([0, 3, 5])
        vs = jnp.array([2, 1, 4])
        poses = jnp.stack([pose] * 3)
        ro_pix, rd_pix = get_rays_for_pixels(dirs, poses, us, vs)
        for k in range(3):
            np.testing.assert_allclose(
                np.asarray(rd_pix[k]), np.asarray(rd_full[vs[k], us[k]]), atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(ro_pix[k]), np.asarray(ro_full[vs[k], us[k]]), atol=1e-6
            )

    def test_pixel_rays_differentiable_wrt_pose(self):
        H, W, f = 6, 6, 8.0
        dirs = get_ray_directions(H, W, f)
        pose = jnp.eye(4).at[:3, 3].set(jnp.array([0.0, 0.0, 4.0]))

        def loss(p):
            ro, rd = get_rays_for_pixels(
                dirs, p[None], jnp.array([2]), jnp.array([3])
            )
            return jnp.sum(rd) + jnp.sum(ro)

        g = jax.grad(loss)(pose)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


class TestStratifiedSampling:
    def test_shapes(self):
        ro = jnp.zeros((100, 3))
        rd = jnp.ones((100, 3))
        pts, z = sample_along_rays(None, ro, rd, 2.0, 6.0, 64, perturb=False)
        assert pts.shape == (100, 64, 3)
        assert z.shape == (100, 64)

    def test_deterministic_linspace(self):
        ro = jnp.zeros((2, 3))
        rd = jnp.ones((2, 3))
        _, z = sample_along_rays(None, ro, rd, 2.0, 6.0, 5, perturb=False)
        np.testing.assert_allclose(np.asarray(z[0]), [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-5)

    def test_perturb_within_bounds(self):
        key = jax.random.PRNGKey(0)
        ro = jnp.zeros((50, 3))
        rd = jnp.ones((50, 3))
        _, z = sample_along_rays(key, ro, rd, 2.0, 6.0, 16, perturb=True)
        z = np.asarray(z)
        assert z.min() >= 2.0 - 1e-5
        assert z.max() <= 6.0 + 1e-5
        assert np.all(np.diff(z, axis=-1) > 0)  # monotone (bins disjoint)

    def test_lindisp(self):
        ro = jnp.zeros((1, 3))
        rd = jnp.ones((1, 3))
        _, z = sample_along_rays(None, ro, rd, 2.0, 6.0, 3, perturb=False, lindisp=True)
        # disparity midpoint: 1/z = (1/2 + 1/6)/2 -> z = 3
        np.testing.assert_allclose(np.asarray(z[0]), [2.0, 3.0, 6.0], atol=1e-4)

    def test_points_on_ray(self):
        ro = jnp.array([[1.0, 0.0, 0.0]])
        rd = jnp.array([[0.0, 1.0, 0.0]])
        pts, z = sample_along_rays(None, ro, rd, 2.0, 6.0, 4, perturb=False)
        np.testing.assert_allclose(
            np.asarray(pts[0, :, 1]), np.asarray(z[0]), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(pts[0, :, 0]), 1.0, atol=1e-5)


class TestSamplePDF:
    def test_uniform_weights_det(self):
        """Uniform weights -> deterministic samples are ~uniform quantiles."""
        bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)
        weights = jnp.ones((4, 8))
        s = sample_pdf(None, bins, weights, 17, det=True)
        assert s.shape == (4, 17)
        np.testing.assert_allclose(
            np.asarray(s[0]), np.linspace(0.0, 1.0, 17), atol=1e-3
        )

    def test_concentrated_weights(self):
        """All mass in one bin -> all samples land in that bin."""
        bins = jnp.linspace(0.0, 1.0, 9)[None]
        weights = jnp.zeros((1, 8)).at[0, 3].set(100.0)
        s = np.asarray(sample_pdf(None, bins, weights, 32, det=True))
        inside = np.mean((s >= bins[0, 3] - 1e-3) & (s <= bins[0, 4] + 1e-3))
        assert inside > 0.9

    def test_stochastic_in_range(self):
        key = jax.random.PRNGKey(3)
        bins = jnp.linspace(2.0, 6.0, 9)[None].repeat(10, 0)
        weights = jax.random.uniform(key, (10, 8))
        s = np.asarray(sample_pdf(key, bins, weights, 64, det=False))
        assert s.min() >= 2.0 - 1e-4 and s.max() <= 6.0 + 1e-4

    def test_golden_vs_reference_torch(self):
        """Recorded outputs of the REFERENCE torch sample_pdf
        (noisy_src/rays.py:213-279) in deterministic mode, captured by
        executing /root/reference on CPU: 9 linspace(2,6) bin edges, three
        weight rows (peaked / bimodal-edges / uniform), 6 det samples.
        Any drift in the masked-reduction CDF inversion fails this."""
        bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 9), (3, 9))
        weights = jnp.array([
            [0.0, 0.1, 0.5, 1.0, 0.5, 0.1, 0.0, 0.0],
            [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
            [0.125, 0.125, 0.125, 0.125, 0.125, 0.125, 0.125, 0.125],
        ], dtype=jnp.float32)
        golden = np.array([
            [2.0, 3.3399892, 3.6399996, 3.8600054, 4.160021, 6.0],
            [2.0, 2.200006, 2.400012, 5.599988, 5.799994, 6.0],
            [2.0, 2.8, 3.6, 4.4, 5.2, 6.0],
        ], dtype=np.float32)
        s = np.asarray(sample_pdf(None, bins, weights, 6, det=True))
        np.testing.assert_allclose(s, golden, atol=2e-5)

    def test_matches_reference_shapes(self):
        """Reference smoke: 64 coarse + 128 fine = 192 total
        (noisy_src/test_baseline.py:88-95)."""
        key = jax.random.PRNGKey(0)
        ro = jnp.zeros((100, 3))
        rd = jnp.ones((100, 3))
        _, z = sample_along_rays(None, ro, rd, 2.0, 6.0, 64, perturb=False)
        w = jax.random.uniform(key, (100, 64))
        pts_f, z_f = sample_hierarchical(key, ro, rd, z, w, 128, det=False)
        assert z_f.shape == (100, 192)
        assert pts_f.shape == (100, 192, 3)


class TestHierarchical:
    def test_sorted_output(self):
        key = jax.random.PRNGKey(1)
        ro = jnp.zeros((10, 3))
        rd = jnp.ones((10, 3))
        _, z = sample_along_rays(None, ro, rd, 2.0, 6.0, 16, perturb=False)
        w = jax.random.uniform(key, (10, 16))
        _, z_f = sample_hierarchical(key, ro, rd, z, w, 16, det=False)
        assert np.all(np.diff(np.asarray(z_f), axis=-1) >= 0)

    def test_fine_samples_detached(self):
        """Gradient flows only through coarse z (reference .detach(),
        noisy_src/rays.py:325)."""
        ro = jnp.zeros((4, 3))
        rd = jnp.ones((4, 3))

        def f(w):
            _, z = sample_along_rays(None, ro, rd, 2.0, 6.0, 8, perturb=False)
            _, z_f = sample_hierarchical(
                jax.random.PRNGKey(0), ro, rd, z, w, 8, det=True
            )
            return jnp.sum(z_f)

        g = jax.grad(f)(jnp.ones((4, 8)))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
