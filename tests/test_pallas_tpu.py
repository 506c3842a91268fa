"""On-chip (Mosaic-compiled) Pallas kernel parity — VERDICT r4 weak #5/#7.

tests/test_pallas.py runs the same kernels through the Pallas INTERPRETER
on the CPU mesh; this module compiles them with Mosaic on the real chip
and checks forward + custom-VJP gradient parity against XLA at small
batch (the store-mode batch>=1024 remote-compile-capacity gate stays
env-gated — CLAUDE.md).

Run:  ROBUST_NERF_TPU_TESTS=1 python -m pytest -m tpu tests/ -q
Default pytest runs deselect these (pytest.ini addopts) and force CPU,
where Mosaic cannot compile.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("ROBUST_NERF_TPU_TESTS") != "1"
        or jax.default_backend() != "tpu",
        reason="needs the real chip (ROBUST_NERF_TPU_TESTS=1 + TPU backend)",
    ),
]


@pytest.fixture(scope="module")
def setup():
    from robust_nerf_tpu.config import ModelConfig
    from robust_nerf_tpu.models.nerf import init_nerf_params

    cfg = ModelConfig()            # production config: 8x256, skip @4
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    kp, kd = jax.random.split(jax.random.PRNGKey(1))
    n = 640                        # small batch: clear of the store-mode gate
    pts = jax.random.uniform(kp, (n, 3), jnp.float32, -1.5, 1.5)
    dirs = jax.random.normal(kd, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return cfg, params, pts, dirs


class TestOnChipForward:
    def test_fused_forward_matches_xla(self, setup):
        from robust_nerf_tpu.experimental.pallas.fused_mlp import (
            nerf_apply_fused,
        )
        from robust_nerf_tpu.models.nerf import nerf_apply

        cfg, params, pts, dirs = setup
        rgb_x, sig_x = jax.jit(nerf_apply)(params, pts, dirs, cfg)
        rgb_p, sig_p = jax.jit(
            lambda p, x, d: nerf_apply_fused(p, x, d, cfg)
        )(params, pts, dirs)
        # Mosaic-compiled float32 matmuls vs XLA: small reassociation noise
        np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(sig_p), np.asarray(sig_x),
                                   atol=5e-4)


class TestOnChipGrads:
    def test_param_and_input_grads_match_xla(self, setup):
        from robust_nerf_tpu.experimental.pallas.fused_mlp import (
            nerf_apply_fused,
        )
        from robust_nerf_tpu.models.nerf import nerf_apply

        cfg, params, pts, dirs = setup

        def loss(apply_fn):
            def f(p, x, d):
                rgb, sig = apply_fn(p, x, d, cfg)
                return jnp.sum(rgb ** 2) + jnp.sum(jnp.tanh(sig))
            return f

        gx = jax.jit(jax.grad(loss(nerf_apply), argnums=(0, 1, 2)))(
            params, pts, dirs)
        gp = jax.jit(jax.grad(loss(nerf_apply_fused), argnums=(0, 1, 2)))(
            params, pts, dirs)
        for k in gx[0]:
            scale = float(jnp.abs(gx[0][k]).max()) + 1e-8
            np.testing.assert_allclose(
                np.asarray(gp[0][k]) / scale, np.asarray(gx[0][k]) / scale,
                atol=2e-4, err_msg=f"param grad {k}",
            )
        for name, a, b in (("d_pts", gp[1], gx[1]), ("d_dirs", gp[2], gx[2])):
            scale = float(jnp.abs(b).max()) + 1e-8
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-4,
                err_msg=name,
            )


class TestOnChipResample:
    def test_fused_resample_matches_xla(self):
        from robust_nerf_tpu.core.rays import sample_pdf
        from robust_nerf_tpu.experimental.pallas.resample import (
            sample_pdf_fused,
        )

        key = jax.random.PRNGKey(2)
        n_rays, n_bins = 256, 63
        bins = jnp.sort(
            jax.random.uniform(key, (n_rays, n_bins + 1), jnp.float32, 2.0, 6.0),
            axis=-1,
        )
        weights = jax.random.uniform(
            jax.random.PRNGKey(3), (n_rays, n_bins), jnp.float32
        )
        out_x = jax.jit(
            lambda b, w: sample_pdf(None, b, w, 128, det=True)
        )(bins, weights)
        out_p = jax.jit(
            lambda b, w: sample_pdf_fused(None, b, w, 128, det=True)
        )(bins, weights)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   atol=1e-5)
