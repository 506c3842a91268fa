"""Microbatched gradient accumulation (TPUConfig.microbatch).

One optimizer update per full batch, rendered/backpropped as scanned
microbatches: the mean of equal-size microbatch grads IS the full-batch
grad, so with a deterministic render (perturb off) the two schedules must
produce the same training trajectory to float tolerance. Activation memory
is O(microbatch) — the schedule that makes very large ray batches fit HBM
(DESIGN.md batch sweep / roofline).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.config import PoseOptConfig, RenderConfig
from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_poses
from robust_nerf_tpu.data.banks import build_pixel_bank, build_ray_bank
from robust_nerf_tpu.parallel.mesh import create_mesh, replicate
from robust_nerf_tpu.training.steps import (
    _microbatch_count,
    create_pose_opt_state,
    create_train_state,
    make_pose_opt_chunk,
    make_train_chunk,
)


def _det_cfg(cfg, microbatch=0):
    """Deterministic-render copy (no stratified jitter) with the knob set."""
    import copy

    cfg = copy.deepcopy(cfg)
    cfg.render = RenderConfig(
        num_samples=cfg.render.num_samples,
        num_samples_fine=cfg.render.num_samples_fine,
        perturb=False,
    )
    cfg.tpu = dataclasses.replace(cfg.tpu, microbatch=microbatch)
    return cfg


class TestMicrobatchCount:
    def test_off_by_default(self, tiny_config):
        # default is -1 = auto, which resolves to OFF on the CPU backend
        assert tiny_config.tpu.microbatch == -1
        assert _microbatch_count(tiny_config) == 1

    def test_active_when_divisible(self, tiny_config):
        cfg = _det_cfg(tiny_config, microbatch=64)  # batch 256
        assert _microbatch_count(cfg) == 4

    def test_falls_back_when_not_divisible(self, tiny_config):
        assert _microbatch_count(_det_cfg(tiny_config, microbatch=96)) == 1

    def test_falls_back_when_larger_than_batch(self, tiny_config):
        assert _microbatch_count(_det_cfg(tiny_config, microbatch=512)) == 1


class TestStandardEquivalence:
    def test_gradients_match_fused_step(self, tiny_scene, tiny_config):
        """The exact mathematical claim: with a key-free render
        (perturb=False), the mean of the 4 microbatch grads equals the
        full-batch grad to float-summation tolerance."""
        from robust_nerf_tpu.data.banks import sample_ray_batch
        from robust_nerf_tpu.models.nerf import nerf_apply
        from robust_nerf_tpu.training.steps import (
            _microbatched_grads,
            _render_loss,
        )

        cfg = _det_cfg(tiny_config)
        bank, _, _ = build_ray_bank(tiny_scene)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        batch = sample_ray_batch(bank, jax.random.PRNGKey(2), 256)

        def grad_fn(mb, k):
            return jax.value_and_grad(
                lambda m: _render_loss(m, mb, k, cfg, nerf_apply),
                has_aux=True,
            )(state.models)

        (_, m_full), g_full = grad_fn(batch, jax.random.PRNGKey(3))
        m_micro, g_micro = _microbatched_grads(
            grad_fn, batch, jax.random.PRNGKey(3), 4, None
        )

        # Strongest check first: the scan must match a hand-written mean of
        # the four slice grads (same math, Python loop) to near-ULP level —
        # this isolates the helper from backend batch-shape effects. (The
        # eager loop and the traced scan can differ by a few ULP.)
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        slice_grads = []
        for i in range(4):
            sl = jax.tree_util.tree_map(
                lambda x: x[i * 64:(i + 1) * 64], batch
            )
            _, g = grad_fn(sl, keys[i])
            slice_grads.append(g)
        g_manual = jax.tree_util.tree_map(
            lambda *x: sum(x) / 4.0, *slice_grads
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_micro),
            jax.tree_util.tree_leaves(g_manual),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
            )

        # vs the fused full-batch step: the SAME rays run at M=64 instead
        # of M=256, so per-ray results differ at the backend
        # matmul-blocking level (measured ~4e-5 abs on CPU) — tolerance is
        # float-blocking, not bit-equality.
        np.testing.assert_allclose(
            float(m_full["loss"]), float(m_micro["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(m_full["psnr"]), float(m_micro["psnr"]), rtol=1e-4
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_full),
            jax.tree_util.tree_leaves(g_micro),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4
            )

    def test_trajectory_matches_fused_step(self, tiny_scene, tiny_config):
        """Six Adam steps from init: the loss trajectories must overlay.
        Per-element param equality is NOT asserted — early Adam updates are
        sign-like (m/sqrt(v) ~ +/-1 with fresh moments), so float-blocking
        grad diffs decorrelate individual weights at the ~lr level; the
        gradients themselves are compared tightly above."""
        bank, _, _ = build_ray_bank(tiny_scene)
        states, metrics = [], []
        for mb in (0, 64):
            cfg = _det_cfg(tiny_config, microbatch=mb)
            state = create_train_state(jax.random.PRNGKey(0), cfg)
            chunk = make_train_chunk(cfg, steps=6)
            state, m = chunk(state, bank, jax.random.PRNGKey(1))
            states.append(state)
            metrics.append(m)

        np.testing.assert_allclose(
            np.asarray(metrics[0]["loss"]), np.asarray(metrics[1]["loss"]),
            rtol=1e-3, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(metrics[0]["psnr"]), np.asarray(metrics[1]["psnr"]),
            rtol=1e-3,
        )
        for s_ in states:
            assert all(
                np.all(np.isfinite(np.asarray(x)))
                for x in jax.tree_util.tree_leaves(s_.models)
            )

    def test_converges_with_jitter(self, tiny_scene, tiny_config):
        """Production config (perturb on): microbatched training converges."""
        import copy

        cfg = copy.deepcopy(tiny_config)
        cfg.tpu = dataclasses.replace(cfg.tpu, microbatch=64)
        bank, _, _ = build_ray_bank(tiny_scene)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        chunk = make_train_chunk(cfg, steps=20)
        state, m0 = chunk(state, bank, jax.random.PRNGKey(1))
        for _ in range(2):
            state, m = chunk(state, bank, jax.random.PRNGKey(1))
        assert float(m["loss"][-1]) < float(m0["loss"][0])
        assert np.all(np.isfinite(np.asarray(m["loss"])))


class TestPoseOptEquivalence:
    def test_trajectory_matches_fused_step(self, tiny_scene, tiny_config):
        """Pose grads accumulate across microbatches exactly like MLP grads
        (each microbatch sees a different subset of each image's pixels)."""
        states, metrics = [], []
        for mb in (0, 64):
            cfg = _det_cfg(tiny_config, microbatch=mb)
            cfg.pose_opt = PoseOptConfig(pose_opt_delay=0, pose_lr=1e-3)
            bank = build_pixel_bank(tiny_scene)
            noisy, _ = add_noise_to_poses(
                tiny_scene.poses, NoiseConfig(rotation_noise_deg=2.0, seed=0)
            )
            s = create_pose_opt_state(
                jax.random.PRNGKey(0), cfg, jnp.asarray(noisy)
            )
            c = make_pose_opt_chunk(cfg, steps=5)
            s, m = c(s, bank, jax.random.PRNGKey(1))
            states.append(s)
            metrics.append(m)

        # Adam turns epsilon-level grad diffs into ~pose_lr-level update
        # diffs (early m/sqrt(v) is sign-like), so per-element delta
        # equality is not a meaningful contract after 5 steps — the grads
        # themselves are compared tightly in TestStandardEquivalence. Here:
        # the two schedules must produce the same loss trajectory and move
        # the deltas by the same magnitude.
        np.testing.assert_allclose(
            np.asarray(metrics[0]["loss"]), np.asarray(metrics[1]["loss"]),
            rtol=1e-3, atol=1e-5,
        )
        n0 = float(np.linalg.norm(states[0].pose_params["rotation_deltas"]))
        n1 = float(np.linalg.norm(states[1].pose_params["rotation_deltas"]))
        assert n0 > 0 and abs(n0 - n1) / n0 < 0.2

    def test_hoisted_rays_match_per_microbatch_regen(
        self, tiny_scene, tiny_config, monkeypatch
    ):
        """The hoisted path (rays regenerated once per step via jax.vjp,
        cotangents streamed out of the scan) computes the SAME math as the
        per-microbatch regen — identical up to float summation order, so
        the 5-step trajectories must agree far tighter than the fused-vs-
        microbatched comparison above. Reg weights nonzero so the
        closed-form reg gradient is exercised. gauge_anchor off: the
        SIM(3) projection's near-cancelling subtractions amplify the
        paths' f32 summation-order difference ~20x (2.4e-6 abs on 1e-4
        deltas), which is orthogonal to the hoist equivalence under test
        (the anchored step is covered by tests/test_gauge.py)."""
        states, metrics = [], []
        for hoist in ("1", "0"):
            monkeypatch.setenv("ROBUST_NERF_HOIST_POSE_RAYS", hoist)
            cfg = _det_cfg(tiny_config, microbatch=64)
            cfg.pose_opt = PoseOptConfig(
                pose_opt_delay=0, pose_lr=1e-3,
                rotation_reg_weight=0.01, translation_reg_weight=0.001,
                gauge_anchor=False,
            )
            bank = build_pixel_bank(tiny_scene)
            noisy, _ = add_noise_to_poses(
                tiny_scene.poses, NoiseConfig(rotation_noise_deg=2.0, seed=0)
            )
            s = create_pose_opt_state(
                jax.random.PRNGKey(0), cfg, jnp.asarray(noisy)
            )
            c = make_pose_opt_chunk(cfg, steps=5)
            s, m = c(s, bank, jax.random.PRNGKey(1))
            states.append(s)
            metrics.append(m)

        for key in ("loss", "pose_reg_loss", "rotation_reg"):
            np.testing.assert_allclose(
                np.asarray(metrics[0][key]), np.asarray(metrics[1][key]),
                rtol=1e-5, atol=1e-7, err_msg=key,
            )
        np.testing.assert_allclose(
            np.asarray(states[0].pose_params["rotation_deltas"]),
            np.asarray(states[1].pose_params["rotation_deltas"]),
            rtol=1e-3, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(states[0].pose_params["translation_deltas"]),
            np.asarray(states[1].pose_params["translation_deltas"]),
            rtol=1e-3, atol=1e-7,
        )


class TestShardedMicrobatch:
    def test_runs_on_mesh_and_matches_single_device(self, tiny_scene, tiny_config):
        """Microbatching composes with data-parallel sharding: the 8-device
        run must overlay the single-device microbatched run."""
        bank, _, _ = build_ray_bank(tiny_scene)
        cfg = _det_cfg(tiny_config, microbatch=64)

        s1 = create_train_state(jax.random.PRNGKey(0), cfg)
        c1 = make_train_chunk(cfg, mesh=None, steps=5)
        s1, m1 = c1(s1, bank, jax.random.PRNGKey(1))

        mesh = create_mesh(num_devices=8)
        s8 = create_train_state(jax.random.PRNGKey(0), cfg)
        s8 = replicate(s8, mesh)
        bank8 = replicate(bank, mesh)
        c8 = make_train_chunk(cfg, mesh=mesh, steps=5)
        s8, m8 = c8(s8, bank8, jax.random.PRNGKey(1))

        np.testing.assert_allclose(
            np.asarray(m1["loss"]), np.asarray(m8["loss"]), rtol=1e-4, atol=1e-6
        )

    def test_composes_with_sharded_bank(self, tiny_scene, tiny_config):
        """shard_bank + microbatch: the shard_map sampler emits one global
        (B, ...) batch which then scans as microbatches — must run and
        train on the 8-device mesh."""
        from robust_nerf_tpu.data.banks import shard_bank

        cfg = _det_cfg(tiny_config, microbatch=64)
        cfg.tpu = dataclasses.replace(cfg.tpu, shard_bank=True)
        mesh = create_mesh(num_devices=8)
        bank, _, _ = build_ray_bank(tiny_scene)
        sbank = shard_bank(bank, mesh)
        state = replicate(create_train_state(jax.random.PRNGKey(0), cfg), mesh)
        chunk = make_train_chunk(cfg, mesh=mesh, steps=10)
        state, m = chunk(state, sbank, jax.random.PRNGKey(1))
        losses = np.asarray(m["loss"])
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]
