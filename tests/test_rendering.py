"""Volume rendering tests — compositing golden values, pipeline shapes,
chunked==unchunked equivalence (ports noisy_src/test_baseline.py:100-146)."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_nerf_tpu.config import ModelConfig, RenderConfig, TPUConfig
from robust_nerf_tpu.models.nerf import create_nerf
from robust_nerf_tpu.ops.rendering import (
    raw2outputs,
    render_image,
    render_rays,
    render_rays_chunked,
)


class TestRaw2Outputs:
    def test_shapes(self):
        N, S = 32, 16
        out = raw2outputs(
            jnp.ones((N, S, 3)) * 0.5,
            jnp.ones((N, S)),
            jnp.broadcast_to(jnp.linspace(2, 6, S), (N, S)),
            jnp.ones((N, 3)),
        )
        assert out["rgb_map"].shape == (N, 3)
        assert out["depth_map"].shape == (N,)
        assert out["acc_map"].shape == (N,)
        assert out["weights"].shape == (N, S)

    def test_empty_scene_is_white(self):
        """sigma=0 -> acc=0 -> white composite (rendering.py:108-109)."""
        N, S = 4, 8
        out = raw2outputs(
            jnp.zeros((N, S, 3)),
            jnp.zeros((N, S)),
            jnp.broadcast_to(jnp.linspace(2, 6, S), (N, S)),
            jnp.ones((N, 3)) / jnp.sqrt(3.0),
        )
        np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0, atol=1e-6)

    def test_empty_scene_black_background(self):
        out = raw2outputs(
            jnp.zeros((4, 8, 3)),
            jnp.zeros((4, 8)),
            jnp.broadcast_to(jnp.linspace(2, 6, 8), (4, 8)),
            jnp.ones((4, 3)),
            white_background=False,
        )
        np.testing.assert_allclose(np.asarray(out["rgb_map"]), 0.0, atol=1e-6)

    def test_opaque_first_sample(self):
        """Huge density at sample 0 -> output = that sample's color,
        depth = its z."""
        N, S = 2, 8
        rgb = jnp.zeros((N, S, 3)).at[:, 0].set(jnp.array([0.2, 0.5, 0.9]))
        sigma = jnp.zeros((N, S)).at[:, 0].set(1e6)
        z = jnp.broadcast_to(jnp.linspace(2, 6, S), (N, S))
        rd = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (N, 1))
        out = raw2outputs(rgb, sigma, z, rd)
        np.testing.assert_allclose(
            np.asarray(out["rgb_map"]), [[0.2, 0.5, 0.9]] * 2, atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(out["depth_map"]), 2.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out["acc_map"]), 1.0, atol=1e-5)

    def test_weights_sum_le_one(self):
        key = jax.random.PRNGKey(0)
        out = raw2outputs(
            jax.random.uniform(key, (16, 12, 3)),
            jax.random.uniform(key, (16, 12)) * 3,
            jnp.broadcast_to(jnp.linspace(2, 6, 12), (16, 12)),
            jnp.ones((16, 3)),
        )
        assert float(jnp.max(jnp.sum(out["weights"], -1))) <= 1.0 + 1e-5

    def test_dist_scaled_by_ray_norm(self):
        """Non-unit rays_d scales distances (rendering.py:75)."""
        S = 8
        rgb = jnp.ones((1, S, 3)) * 0.5
        sigma = jnp.ones((1, S)) * 0.5
        z = jnp.broadcast_to(jnp.linspace(2, 6, S), (1, S))
        out1 = raw2outputs(rgb, sigma, z, jnp.array([[0.0, 0.0, 1.0]]))
        out2 = raw2outputs(rgb, sigma, z, jnp.array([[0.0, 0.0, 2.0]]))
        # acc saturates at 1 via the 1e10 tail for any sigma>0, so compare
        # the FIRST sample's weight: doubled |rays_d| doubles its optical
        # depth -> strictly larger alpha_0.
        assert float(out2["weights"][0, 0]) > float(out1["weights"][0, 0])

    def test_sigma_trailing_dim_squeezed(self):
        out = raw2outputs(
            jnp.ones((4, 8, 3)),
            jnp.ones((4, 8, 1)),
            jnp.broadcast_to(jnp.linspace(2, 6, 8), (4, 8)),
            jnp.ones((4, 3)),
        )
        assert out["weights"].shape == (4, 8)


class TestRenderRays:
    def setup_method(self):
        self.models = create_nerf(jax.random.PRNGKey(0))
        self.mcfg = ModelConfig()
        self.rcfg = RenderConfig(num_samples=16, num_samples_fine=16)
        key = jax.random.PRNGKey(1)
        self.ro = jnp.zeros((64, 3)).at[:, 2].set(4.0)
        d = jax.random.normal(key, (64, 3)) * 0.05
        self.rd = (d - jnp.array([0.0, 0.0, 1.0]))
        self.rd = self.rd / jnp.linalg.norm(self.rd, axis=-1, keepdims=True)

    def test_output_keys_hierarchical(self):
        out = render_rays(
            self.models, self.ro, self.rd, jax.random.PRNGKey(0),
            self.rcfg, self.mcfg, is_train=True,
        )
        for k in ("rgb_coarse", "depth_coarse", "acc_coarse",
                  "rgb_fine", "depth_fine", "acc_fine"):
            assert k in out
        assert out["rgb_fine"].shape == (64, 3)

    def test_coarse_only(self):
        rcfg = RenderConfig(num_samples=16, use_hierarchical=False)
        models = {"coarse": self.models["coarse"]}
        out = render_rays(
            models, self.ro, self.rd, jax.random.PRNGKey(0), rcfg, self.mcfg
        )
        assert "rgb_fine" not in out

    def test_eval_deterministic(self):
        out1 = render_rays(
            self.models, self.ro, self.rd, jax.random.PRNGKey(0),
            self.rcfg, self.mcfg, is_train=False,
        )
        out2 = render_rays(
            self.models, self.ro, self.rd, jax.random.PRNGKey(99),
            self.rcfg, self.mcfg, is_train=False,
        )
        np.testing.assert_allclose(
            np.asarray(out1["rgb_fine"]), np.asarray(out2["rgb_fine"]), atol=1e-6
        )

    def test_chunked_matches_unchunked(self):
        """Tile size forcing multiple chunks must be exact
        (reference multi-chunk test, test_baseline.py:127-144 w/ chunk 25)."""
        full = render_rays(
            self.models, self.ro, self.rd, jax.random.PRNGKey(0),
            self.rcfg, self.mcfg, is_train=False,
        )
        chunked = render_rays_chunked(
            self.models, self.ro, self.rd, jax.random.PRNGKey(0),
            self.rcfg, self.mcfg, is_train=False, tile=16,
        )
        np.testing.assert_allclose(
            np.asarray(full["rgb_fine"]), np.asarray(chunked["rgb_fine"]), atol=1e-5
        )

    def test_chunked_unaligned_n(self):
        """N not a multiple of tile: padding must not leak into results."""
        ro, rd = self.ro[:37], self.rd[:37]
        full = render_rays(
            self.models, ro, rd, jax.random.PRNGKey(0),
            self.rcfg, self.mcfg, is_train=False,
        )
        chunked = render_rays_chunked(
            self.models, ro, rd, jax.random.PRNGKey(0),
            self.rcfg, self.mcfg, is_train=False, tile=16,
        )
        assert chunked["rgb_fine"].shape == (37, 3)
        np.testing.assert_allclose(
            np.asarray(full["rgb_fine"]), np.asarray(chunked["rgb_fine"]), atol=1e-5
        )

    def test_render_image(self):
        pose = jnp.eye(4).at[:3, 3].set(jnp.array([0.0, 0.0, 4.0]))
        out = render_image(
            self.models, pose, 16, 16, 20.0, self.rcfg, self.mcfg,
            TPUConfig(eval_tile=64),
        )
        assert out["rgb"].shape == (16, 16, 3)
        assert out["depth"].shape == (16, 16)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))
