"""Fused Pallas MLP kernel tests — forward parity and custom-VJP gradient
parity vs the XLA implementation (models/nerf.py:nerf_apply).

Runs in interpreter mode on the CPU test mesh (Mosaic targets TPU only);
the same kernel code compiles for the chip. Gradient parity covers dW/db
for every layer, d_pts, and d_dirs — d_pts/d_dirs are load-bearing for
pose optimization (rays are differentiable w.r.t. camera poses).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.config import ModelConfig
from robust_nerf_tpu.models.nerf import init_nerf_params, nerf_apply
from robust_nerf_tpu.experimental.pallas.fused_mlp import nerf_apply_fused


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig()            # full production config: 8x256, skip @4
    key = jax.random.PRNGKey(0)
    params = init_nerf_params(key, cfg)
    kp, kd = jax.random.split(jax.random.PRNGKey(1))
    n = 1500                       # not a multiple of either tile size
    pts = jax.random.uniform(kp, (n, 3), jnp.float32, -1.5, 1.5)
    dirs = jax.random.normal(kd, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return cfg, params, pts, dirs


class TestForwardParity:
    def test_matches_xla(self, setup):
        cfg, params, pts, dirs = setup
        rgb_x, sig_x = nerf_apply(params, pts, dirs, cfg)
        rgb_p, sig_p = nerf_apply_fused(params, pts, dirs, cfg)
        np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(sig_p), np.asarray(sig_x),
                                   atol=2e-5)

    def test_batched_shape(self, setup):
        cfg, params, pts, dirs = setup
        rgb, sig = nerf_apply_fused(
            params, pts[:1024].reshape(16, 64, 3),
            dirs[:1024].reshape(16, 64, 3), cfg,
        )
        assert rgb.shape == (16, 64, 3)
        assert sig.shape == (16, 64, 1)

    def test_relu_sigma_config(self, setup):
        cfg, params, pts, dirs = setup
        cfg_relu = ModelConfig(sigma_activation="relu")
        rgb_x, sig_x = nerf_apply(params, pts, dirs, cfg_relu)
        rgb_p, sig_p = nerf_apply_fused(params, pts, dirs, cfg_relu)
        np.testing.assert_allclose(np.asarray(sig_p), np.asarray(sig_x),
                                   atol=2e-5)


class TestFusedResample:
    """ops/pallas/resample.py vs core/rays.py:sample_pdf — identical math,
    no (B, S, N) intermediates. Reference semantics: noisy_src/rays.py:213-279."""

    def _setup(self, b=700, n=64, key=0):
        k1, k2 = jax.random.split(jax.random.PRNGKey(key))
        z = jnp.sort(jax.random.uniform(k1, (b, n), jnp.float32, 2.0, 6.0), -1)
        w = jax.random.uniform(k2, (b, n - 1)) ** 2
        return z, w

    def test_det_matches_xla(self):
        from robust_nerf_tpu.core.rays import sample_pdf
        from robust_nerf_tpu.experimental.pallas.resample import sample_pdf_fused

        bins, w = self._setup()
        ref = sample_pdf(None, bins, w, 128, det=True)
        got = sample_pdf_fused(None, bins, w, 128, det=True)
        # matmul-cumsum vs jnp.cumsum round in different orders; the ~1e-7
        # cdf wobble can shift an interpolated z by ~1e-4 over a 4-unit
        # range near tight bins — well below sampling resolution.
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)

    def test_stochastic_matches_xla_same_key(self):
        """Both paths draw u = uniform(key, (B, S)) — identical streams."""
        from robust_nerf_tpu.core.rays import sample_pdf
        from robust_nerf_tpu.experimental.pallas.resample import sample_pdf_fused

        bins, w = self._setup(key=7)
        k = jax.random.PRNGKey(3)
        ref = sample_pdf(k, bins, w, 96, det=False)
        got = sample_pdf_fused(k, bins, w, 96, det=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)

    def test_golden_vs_reference_torch(self):
        """Same recorded reference outputs as TestSamplePDF's golden
        (tests/test_rays.py) through the fused kernel."""
        from robust_nerf_tpu.experimental.pallas.resample import sample_pdf_fused

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
        s = np.asarray(sample_pdf_fused(None, bins, weights, 6, det=True))
        np.testing.assert_allclose(s, golden, atol=2e-5)

    def test_render_rays_fused_path_matches(self):
        """Full render with fused_resample forced on == off (det eval)."""
        from robust_nerf_tpu.config import ModelConfig, RenderConfig
        from robust_nerf_tpu.models.nerf import create_nerf
        from robust_nerf_tpu.ops.rendering import render_rays

        mcfg = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                           num_hidden_layers=2, skips=(0,))
        rcfg = RenderConfig(num_samples=16, num_samples_fine=16)
        models = create_nerf(jax.random.PRNGKey(0), mcfg)
        ro = jnp.zeros((64, 3)).at[:, 2].set(4.0)
        rd = jax.random.normal(jax.random.PRNGKey(1), (64, 3)) * 0.05 - jnp.array(
            [0.0, 0.0, 1.0]
        )
        out_x = render_rays(models, ro, rd, jax.random.PRNGKey(2), rcfg, mcfg,
                            is_train=False, fused_resample=False)
        out_p = render_rays(models, ro, rd, jax.random.PRNGKey(2), rcfg, mcfg,
                            is_train=False, fused_resample=True)
        np.testing.assert_allclose(np.asarray(out_p["rgb_fine"]),
                                   np.asarray(out_x["rgb_fine"]), atol=1e-5)

    def test_grad_through_render_with_fused_resample(self):
        """The resample is detached (reference .detach()) — grads must flow
        through the rest of the render without trying to differentiate the
        kernel (regression: linearization error through pallas_call)."""
        from robust_nerf_tpu.config import ModelConfig, RenderConfig
        from robust_nerf_tpu.models.nerf import create_nerf
        from robust_nerf_tpu.ops.rendering import render_rays

        mcfg = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                           num_hidden_layers=2, skips=(0,))
        rcfg = RenderConfig(num_samples=8, num_samples_fine=8)
        models = create_nerf(jax.random.PRNGKey(0), mcfg)
        ro = jnp.zeros((32, 3)).at[:, 2].set(4.0)
        rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (32, 1))

        def loss(m):
            out = render_rays(m, ro, rd, jax.random.PRNGKey(2), rcfg, mcfg,
                              is_train=True, fused_resample=True)
            return jnp.mean(out["rgb_fine"] ** 2)

        g = jax.jit(jax.grad(loss))(models)
        total = sum(float(jnp.sum(jnp.abs(x)))
                    for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0


class TestEvalPath:
    def test_render_image_pallas_matches_xla(self):
        """Full-frame eval (render_image) through the fused forward must
        match the XLA path — the val/inference surface uses it when
        TPUConfig.use_pallas is set."""
        from robust_nerf_tpu.config import ModelConfig, RenderConfig, TPUConfig
        from robust_nerf_tpu.data.synthetic import pose_spherical
        from robust_nerf_tpu.models.nerf import create_nerf
        from robust_nerf_tpu.ops.rendering import render_image

        mcfg = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                           num_hidden_layers=2, skips=(0,))
        rcfg = RenderConfig(num_samples=8, num_samples_fine=8)
        models = create_nerf(jax.random.PRNGKey(0), mcfg)
        pose = pose_spherical(30.0, -30.0, 4.0)
        out_x = render_image(models, pose, 16, 16, 20.0, rcfg, mcfg,
                             TPUConfig(eval_tile=64))
        out_p = render_image(models, pose, 16, 16, 20.0, rcfg, mcfg,
                             TPUConfig(eval_tile=64, use_pallas=True))
        np.testing.assert_allclose(np.asarray(out_p["rgb"]),
                                   np.asarray(out_x["rgb"]), atol=1e-5)


class TestGradParity:
    def _grads(self, apply_fn, cfg, params, pts, dirs):
        def loss(p, x, d):
            rgb, sigma = apply_fn(p, x, d, cfg)
            # uneven weighting so rgb/sigma cotangents differ
            return jnp.sum(rgb * jnp.array([1.0, 0.5, -0.25])) + 0.1 * jnp.sum(
                jnp.sin(sigma)
            )

        return jax.grad(loss, argnums=(0, 1, 2))(params, pts, dirs)

    def test_param_and_input_grads_match_xla(self, setup):
        cfg, params, pts, dirs = setup
        gp_x, gx_x, gd_x = self._grads(nerf_apply, cfg, params, pts, dirs)
        gp_p, gx_p, gd_p = self._grads(nerf_apply_fused, cfg, params, pts, dirs)

        for k in gp_x:
            ref = np.asarray(gp_x[k])
            got = np.asarray(gp_p[k])
            scale = max(1e-3, float(np.abs(ref).max()))
            # 1e-4: split skip-layer matmuls round in a different order
            # than XLA's concat matmul (f32 summation-order wobble)
            np.testing.assert_allclose(
                got, ref, atol=1e-4 * scale, err_msg=f"param grad {k}"
            )
        # Input grads drive pose optimization. 5e-4: the bwd recompute's
        # split skip-matmuls round in a different order than XLA's concat
        # matmul, and a pre-activation sitting within f32 epsilon of zero
        # can flip its ReLU mask — a handful of elements (~0.1%) then
        # differ by ~0.5% of magnitude, far below SGD noise.
        np.testing.assert_allclose(
            np.asarray(gx_p), np.asarray(gx_x), atol=5e-4,
            err_msg="d_pts",
        )
        np.testing.assert_allclose(
            np.asarray(gd_p), np.asarray(gd_x), atol=5e-4,
            err_msg="d_dirs",
        )

    def test_padding_rows_do_not_leak(self, setup):
        """Grads through a non-tile-aligned batch must equal grads through
        the same rows evaluated alone (padding contributes exactly zero)."""
        cfg, params, pts, dirs = setup
        m = 700   # forces padding in both fwd (1024) and bwd (512) tiles

        def loss(p):
            rgb, sigma = nerf_apply_fused(p, pts[:m], dirs[:m], cfg)
            return jnp.sum(rgb) + jnp.sum(sigma)

        def loss_xla(p):
            rgb, sigma = nerf_apply(p, pts[:m], dirs[:m], cfg)
            return jnp.sum(rgb) + jnp.sum(sigma)

        gp = jax.grad(loss)(params)
        gx = jax.grad(loss_xla)(params)
        for k in gx:
            ref = np.asarray(gx[k])
            scale = max(1e-3, float(np.abs(ref).max()))
            np.testing.assert_allclose(
                np.asarray(gp[k]), ref, atol=5e-5 * scale, err_msg=k
            )

    def test_store_mode_grads_match_xla(self, setup, monkeypatch):
        """ROBUST_NERF_PALLAS_STORE=1: the forward streams trunk
        activations to HBM and the backward reads them instead of
        recomputing — gradients must match the XLA reference exactly like
        the recompute backward does (same tolerances, incl. a
        non-tile-aligned batch so padded activation rows are exercised)."""
        monkeypatch.setenv("ROBUST_NERF_PALLAS_STORE", "1")
        cfg, params, pts, dirs = setup
        m = 700   # non-tile-aligned: padded rows flow through stored h
        gp_x, gx_x, gd_x = self._grads(
            nerf_apply, cfg, params, pts[:m], dirs[:m])
        gp_p, gx_p, gd_p = self._grads(
            nerf_apply_fused, cfg, params, pts[:m], dirs[:m])
        for k in gp_x:
            ref = np.asarray(gp_x[k])
            scale = max(1e-3, float(np.abs(ref).max()))
            np.testing.assert_allclose(
                np.asarray(gp_p[k]), ref, atol=1e-4 * scale,
                err_msg=f"param grad {k} (store mode)",
            )
        np.testing.assert_allclose(
            np.asarray(gx_p), np.asarray(gx_x), atol=5e-4,
            err_msg="d_pts (store mode)",
        )
        np.testing.assert_allclose(
            np.asarray(gd_p), np.asarray(gd_x), atol=5e-4,
            err_msg="d_dirs (store mode)",
        )


class TestPolicyResolution:
    """pallas_enabled must reject unknown string policies: tests and
    benches construct TPUConfig programmatically (bypassing the CLIs'
    choices= validation), and a typo like "On" silently resolving to the
    XLA path would make a forced-kernel A/B measure XLA twice."""

    def test_known_values(self):
        from robust_nerf_tpu.config import TPUConfig
        from robust_nerf_tpu.experimental.pallas import pallas_enabled

        assert pallas_enabled(TPUConfig(use_pallas="on")) is True
        assert pallas_enabled(TPUConfig(use_pallas="off")) is False
        assert pallas_enabled(TPUConfig(use_pallas="auto")) is False
        assert pallas_enabled(TPUConfig(use_pallas=True)) is True
        assert pallas_enabled(TPUConfig(use_pallas=False)) is False

    def test_unknown_string_raises(self):
        from robust_nerf_tpu.config import TPUConfig
        from robust_nerf_tpu.experimental.pallas import pallas_enabled

        with pytest.raises(ValueError, match="use_pallas"):
            pallas_enabled(TPUConfig(use_pallas="On"))
