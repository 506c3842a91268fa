"""Model tests — encoding dims, output invariants, param-count parity.

Ports the reference smoke checks (noisy_src/test_baseline.py:12-48) as
pytest units and adds dtype-path and independence checks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from robust_nerf_tpu.config import ModelConfig
from robust_nerf_tpu.models.nerf import (
    count_params,
    create_nerf,
    init_nerf_params,
    nerf_apply,
    posenc_output_dim,
    positional_encoding,
)


class TestPositionalEncoding:
    def test_output_dim(self):
        """3*(1+2*10)=63 pos, 3*(1+2*4)=27 dir
        (reference: test_baseline.py:20-25)."""
        assert posenc_output_dim(10) == 21
        x = jnp.zeros((5, 3))
        assert positional_encoding(x, 10).shape == (5, 63)
        assert positional_encoding(x, 4).shape == (5, 27)

    def test_includes_input(self):
        x = jnp.array([[0.3, -0.5, 0.7]])
        enc = np.asarray(positional_encoding(x, 4))
        np.testing.assert_allclose(enc[0, :3], [0.3, -0.5, 0.7], atol=1e-6)

    def test_frequency_values(self):
        """Bands are 2^0..2^{L-1}, applied as sin(f*x), cos(f*x)."""
        x = jnp.array([[1.0, 0.0, 0.0]])
        enc = np.asarray(positional_encoding(x, 3))
        # layout: [x(3), then per-freq sin(3) cos(3)]
        np.testing.assert_allclose(enc[0, 3], np.sin(1.0), atol=1e-6)
        np.testing.assert_allclose(enc[0, 6], np.cos(1.0), atol=1e-6)
        np.testing.assert_allclose(enc[0, 9], np.sin(2.0), atol=1e-6)
        np.testing.assert_allclose(enc[0, 15], np.sin(4.0), atol=1e-6)

    def test_zero_input(self):
        enc = np.asarray(positional_encoding(jnp.zeros((1, 3)), 4))
        sin_part = enc[0, 3::6]
        assert np.allclose(enc[0, :3], 0.0)


class TestNeRFModel:
    def test_param_count_matches_reference(self):
        """595,844 params per MLP (reference outputs/*/summary.json)."""
        params = init_nerf_params(jax.random.PRNGKey(0), ModelConfig())
        assert count_params(params) == 595_844

    def test_forward_shapes_and_ranges(self):
        """rgb (N,3) in [0,1]; sigma (N,1) >= 0
        (reference: test_baseline.py:36-39)."""
        cfg = ModelConfig()
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1024, 3), minval=-2, maxval=2)
        d = jax.random.normal(jax.random.PRNGKey(2), (1024, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rgb, sigma = nerf_apply(params, x, d, cfg)
        assert rgb.shape == (1024, 3)
        assert sigma.shape == (1024, 1)
        assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
        assert float(sigma.min()) >= 0.0

    def test_trailing_skip_layer(self):
        """init must size the sigma/feat heads off the trunk's actual
        output dim: a skip at the LAST trunk layer leaves h at
        hidden+pos_dim (regression: init used hidden_dim and nerf_apply
        crashed for e.g. skips=(1,) with 2 layers)."""
        for skips in [(0,), (1,)]:
            cfg = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                              num_hidden_layers=2, skips=skips)
            params = init_nerf_params(jax.random.PRNGKey(0), cfg)
            rgb, sigma = nerf_apply(
                params, jnp.ones((8, 3)), jnp.ones((8, 3)), cfg
            )
            assert rgb.shape == (8, 3) and sigma.shape == (8, 1)

    def test_coarse_fine_independent(self):
        models = create_nerf(jax.random.PRNGKey(0))
        assert "coarse" in models and "fine" in models
        w_c = models["coarse"]["trunk_0_w"]
        w_f = models["fine"]["trunk_0_w"]
        assert not np.allclose(np.asarray(w_c), np.asarray(w_f))

    def test_no_viewdirs_config(self):
        cfg = ModelConfig(use_view_dirs=False)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((8, 3))
        rgb, sigma = nerf_apply(params, x, None, cfg)
        assert rgb.shape == (8, 3)

    def test_view_dependence(self):
        cfg = ModelConfig()
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((16, 3)) * 0.3
        d1 = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
        d2 = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (16, 1))
        rgb1, s1 = nerf_apply(params, x, d1, cfg)
        rgb2, s2 = nerf_apply(params, x, d2, cfg)
        # density is view-independent; color is view-dependent
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
        assert not np.allclose(np.asarray(rgb1), np.asarray(rgb2))

    def test_bf16_close_to_f32(self):
        cfg = ModelConfig()
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (256, 1))
        rgb32, s32 = nerf_apply(params, x, d, cfg, jnp.float32)
        rgb16, s16 = nerf_apply(params, x, d, cfg, jnp.bfloat16)
        assert np.mean(np.abs(np.asarray(rgb32) - np.asarray(rgb16))) < 0.05

    def test_batched_leading_dims(self):
        """Apply works on (..., 3) without flattening."""
        cfg = ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                          num_hidden_layers=2, skips=(0,))
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((4, 7, 3))
        d = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (4, 7, 1))
        rgb, sigma = nerf_apply(params, x, d, cfg)
        assert rgb.shape == (4, 7, 3)
        assert sigma.shape == (4, 7, 1)

    def test_relu_parity_mode(self):
        cfg = ModelConfig(sigma_activation="relu")
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
        d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (64, 1))
        _, sigma = nerf_apply(params, x, d, cfg)
        assert float(sigma.min()) >= 0.0


class TestF8Residuals:
    """TPUConfig.f8_residuals: trunk backward reads float8 activation
    copies. Forward must be bit-identical; gradients within e4m3
    quantization error of the exact path."""

    def _setup(self):
        cfg = ModelConfig(pos_freqs=6, dir_freqs=2, hidden_dim=64,
                          num_hidden_layers=4, skips=(2,))
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (256, 3),
                                 minval=-2, maxval=2)
        dirs = jax.random.normal(jax.random.PRNGKey(2), (256, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        return cfg, params, pts, dirs

    def test_forward_identical(self):
        cfg, params, pts, dirs = self._setup()
        rgb0, sig0 = nerf_apply(params, pts, dirs, cfg)
        rgb1, sig1 = nerf_apply(params, pts, dirs, cfg, f8_residuals=True)
        np.testing.assert_array_equal(np.asarray(rgb0), np.asarray(rgb1))
        np.testing.assert_array_equal(np.asarray(sig0), np.asarray(sig1))

    def test_grads_within_quantization_error(self):
        cfg, params, pts, dirs = self._setup()

        def loss(p, f8):
            rgb, sigma = nerf_apply(p, pts, dirs, cfg, f8_residuals=f8)
            return jnp.mean(rgb ** 2) + 1e-3 * jnp.mean(sigma)

        g0 = jax.grad(lambda p: loss(p, False))(params)
        g1 = jax.grad(lambda p: loss(p, True))(params)
        for k in g0:
            a, b = np.asarray(g0[k]), np.asarray(g1[k])
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
            # e4m3 has a 3-bit mantissa: dW error ~O(3%); dh and bias
            # grads flow through unquantized tensors
            assert rel < 0.05, (k, rel)


class TestFreqAnnealing:
    """BARF coarse-to-fine encoding annealing (pose-opt robustness)."""

    def test_weights_endpoints(self):
        from robust_nerf_tpu.models.nerf import freq_anneal_weights

        w0 = np.asarray(freq_anneal_weights(10, 0.0))
        np.testing.assert_allclose(w0, 0.0, atol=1e-7)
        wL = np.asarray(freq_anneal_weights(10, 10.0))
        np.testing.assert_allclose(wL, 1.0, atol=1e-7)

    def test_weights_progressive(self):
        from robust_nerf_tpu.models.nerf import freq_anneal_weights

        w = np.asarray(freq_anneal_weights(10, 3.5))
        assert np.allclose(w[:3], 1.0)       # bands below alpha fully on
        assert 0.0 < w[3] < 1.0              # transitioning band
        assert np.allclose(w[4:], 0.0)       # bands above alpha off

    def test_encoding_alpha_zero_keeps_input(self):
        x = jnp.array([[0.3, -0.5, 0.7]])
        enc = np.asarray(positional_encoding(x, 4, alpha=0.0))
        np.testing.assert_allclose(enc[0, :3], [0.3, -0.5, 0.7], atol=1e-6)
        np.testing.assert_allclose(enc[0, 3:], 0.0, atol=1e-6)

    def test_encoding_alpha_full_matches_plain(self):
        x = jnp.array([[0.3, -0.5, 0.7]])
        a = np.asarray(positional_encoding(x, 4, alpha=4.0))
        b = np.asarray(positional_encoding(x, 4))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_apply_with_annealing(self):
        cfg = ModelConfig()
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((16, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (16, 1))
        rgb, sigma = nerf_apply(params, x, d, cfg, anneal_alpha=jnp.float32(2.5))
        assert rgb.shape == (16, 3)
        assert np.all(np.isfinite(np.asarray(rgb)))
