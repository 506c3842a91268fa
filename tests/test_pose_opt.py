"""Pose-optimization tests — gating, joint recovery, clean-init no-harm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nerf_tpu.config import PoseOptConfig
from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_poses
from robust_nerf_tpu.core.se3 import pose_errors
from robust_nerf_tpu.data.banks import build_pixel_bank
from robust_nerf_tpu.training.steps import (
    create_pose_opt_state,
    current_poses,
    make_pose_opt_chunk,
)


def _mean_rot_err(state, gt):
    return float(
        pose_errors(current_poses(state), jnp.asarray(gt))["mean_rotation_error_deg"]
    )


class TestGating:
    def test_deltas_frozen_before_delay(self, tiny_scene, tiny_config):
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=1000)
        bank = build_pixel_bank(tiny_scene)
        state = create_pose_opt_state(
            jax.random.PRNGKey(0), cfg, jnp.asarray(tiny_scene.poses)
        )
        chunk = make_pose_opt_chunk(cfg, steps=10)
        opt_state_before = jax.tree_util.tree_map(np.asarray, state.pose_opt_state)
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            np.asarray(state.pose_params["rotation_deltas"]), 0.0, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(state.pose_params["translation_deltas"]), 0.0, atol=1e-9
        )
        assert np.all(np.asarray(m["pose_opt_active"]) == 0.0)
        # the WHOLE pose optimizer state (incl. Adam's count) must be
        # frozen pre-gate — the reference never steps optimizer_poses
        # during the delay, keeping its bias correction fresh
        for a, b in zip(
            jax.tree_util.tree_leaves(opt_state_before),
            jax.tree_util.tree_leaves(state.pose_opt_state),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_deltas_move_after_delay(self, tiny_scene, tiny_config):
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=5)
        bank = build_pixel_bank(tiny_scene)
        noisy, _ = add_noise_to_poses(
            tiny_scene.poses, NoiseConfig(rotation_noise_deg=3.0, seed=0)
        )
        state = create_pose_opt_state(jax.random.PRNGKey(0), cfg, jnp.asarray(noisy))
        chunk = make_pose_opt_chunk(cfg, steps=20)
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        assert float(jnp.linalg.norm(state.pose_params["rotation_deltas"])) > 0
        assert np.asarray(m["pose_opt_active"])[-1] == 1.0

    def test_learn_rotation_only(self, tiny_scene, tiny_config):
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=0, learn_translation=False)
        bank = build_pixel_bank(tiny_scene)
        state = create_pose_opt_state(
            jax.random.PRNGKey(0), cfg, jnp.asarray(tiny_scene.poses)
        )
        chunk = make_pose_opt_chunk(cfg, steps=10)
        state, _ = chunk(state, bank, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            np.asarray(state.pose_params["translation_deltas"]), 0.0, atol=1e-9
        )
        assert float(jnp.linalg.norm(state.pose_params["rotation_deltas"])) > 0


class TestRegularizationParity:
    def test_reg_is_mean_not_sum(self, tiny_scene, tiny_config):
        """Reference uses torch.mean over the (N,3) deltas
        (train_pose_opt.py:380-386); sum would be 3N x stronger."""
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=0)
        bank = build_pixel_bank(tiny_scene)
        state = create_pose_opt_state(
            jax.random.PRNGKey(0), cfg, jnp.asarray(tiny_scene.poses)
        )
        n = state.pose_params["rotation_deltas"].shape[0]
        state = state._replace(pose_params={
            "rotation_deltas": jnp.full((n, 3), 0.01, jnp.float32),
            "translation_deltas": jnp.full((n, 3), 0.02, jnp.float32),
        })
        chunk = make_pose_opt_chunk(cfg, steps=1)
        _, m = chunk(state, bank, jax.random.PRNGKey(1))
        po = cfg.pose_opt
        # mean of squares — value independent of N (a sum would be 3N x)
        assert float(m["rotation_reg"][0]) == pytest.approx(1e-4, rel=1e-5)
        assert float(m["translation_reg"][0]) == pytest.approx(4e-4, rel=1e-5)
        expected = po.rotation_reg_weight * 1e-4 + po.translation_reg_weight * 4e-4
        assert float(m["pose_reg_loss"][0]) == pytest.approx(expected, rel=1e-5)
        # reference metric keys present alongside photometric ones
        assert "psnr_fine" in m or "fine" not in state.models

    def test_reg_weight_changes_trajectory(self, tiny_scene, tiny_config):
        """The reg term must actually flow into the pose gradients: with a
        large weight and nonzero deltas, updates must differ from the
        zero-weight run and be pulled toward zero deltas (= the noisy
        initialization). Guards against the reg silently becoming inert in
        the compiled chunk — the round-2 north-star record was produced by
        exactly such an unnoticed zero-reg configuration."""
        n_img = tiny_scene.poses.shape[0]

        def run(w):
            cfg = tiny_config
            cfg.pose_opt = PoseOptConfig(
                pose_opt_delay=0, rotation_reg_weight=w,
                translation_reg_weight=w,
            )
            bank = build_pixel_bank(tiny_scene)
            state = create_pose_opt_state(
                jax.random.PRNGKey(0), cfg, jnp.asarray(tiny_scene.poses)
            )
            # distinct arrays: the chunk donates its input state, and the
            # same buffer may not be donated twice
            state = state._replace(pose_params={
                "rotation_deltas": jnp.full((n_img, 3), 0.05, jnp.float32),
                "translation_deltas": jnp.full((n_img, 3), 0.05, jnp.float32),
            })
            chunk = make_pose_opt_chunk(cfg, steps=5)
            state, _ = chunk(state, bank, jax.random.PRNGKey(1))
            return np.asarray(state.pose_params["rotation_deltas"])

        free = run(0.0)
        pulled = run(100.0)
        assert not np.allclose(free, pulled), "reg weight had no effect"
        # the heavy reg pulls deltas toward zero harder than the free run
        assert np.abs(pulled).mean() < np.abs(free).mean()

    def test_reg_gated_before_delay(self, tiny_scene, tiny_config):
        """Pre-delay the reference never adds the reg term to the loss
        (optimize_poses gate, train_pose_opt.py:378)."""
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=1000)
        bank = build_pixel_bank(tiny_scene)
        state = create_pose_opt_state(
            jax.random.PRNGKey(0), cfg, jnp.asarray(tiny_scene.poses)
        )
        n = state.pose_params["rotation_deltas"].shape[0]
        state = state._replace(pose_params={
            "rotation_deltas": jnp.full((n, 3), 0.1, jnp.float32),
            "translation_deltas": jnp.full((n, 3), 0.1, jnp.float32),
        })
        chunk = make_pose_opt_chunk(cfg, steps=2)
        _, m = chunk(state, bank, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(m["pose_reg_loss"]), 0.0)
        np.testing.assert_allclose(
            np.asarray(m["loss"]),
            np.asarray(m["loss_coarse"]) + np.asarray(m["loss_fine"]),
            rtol=1e-6,
        )


class TestPerModelClip:
    def test_clip_each_subtree_independently(self):
        """Pose-opt clips coarse and fine separately at max_norm each
        (reference train_pose_opt.py:398-401), unlike one combined norm."""
        from robust_nerf_tpu.training.steps import clip_by_norm_per_subtree

        tx = clip_by_norm_per_subtree(1.0)
        updates = {
            "coarse": {"w": jnp.full((10,), 10.0)},   # norm ~31.6 -> clipped
            "fine": {"w": jnp.full((10,), 0.01)},     # norm ~0.03 -> kept
        }
        out, _ = tx.update(updates, tx.init(updates))
        import optax

        assert float(optax.global_norm(out["coarse"])) == pytest.approx(
            1.0, rel=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["fine"]["w"]), 0.01, rtol=1e-6
        )
        # a single global clip at 1.0 would have scaled fine's grads down
        # by ~31.6x; per-subtree clipping must leave them untouched.


class TestJointRecovery:
    @pytest.mark.slow
    def test_pose_error_decreases(self, tiny_scene, tiny_config):
        """The north-star mechanism: joint optimization must reduce pose
        error from a noisy init on the analytic scene."""
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=40, pose_lr=5e-4)
        bank = build_pixel_bank(tiny_scene)
        gt = tiny_scene.poses
        noisy, _ = add_noise_to_poses(
            gt, NoiseConfig(rotation_noise_deg=3.0, translation_noise_pct=2.0, seed=3)
        )
        state = create_pose_opt_state(jax.random.PRNGKey(0), cfg, jnp.asarray(noisy))
        err_init = _mean_rot_err(state, gt)
        chunk = make_pose_opt_chunk(cfg, steps=50)
        for _ in range(8):
            state, m = chunk(state, bank, jax.random.PRNGKey(1))
        err_final = _mean_rot_err(state, gt)
        assert np.isfinite(float(m["loss"][-1]))
        assert err_final < err_init, f"rot err {err_init:.3f} -> {err_final:.3f}"

    def test_clean_init_does_not_degrade(self, tiny_scene, tiny_config):
        """Reference correctness check: pose-opt from GT init must stay
        near GT (scripts/train_pose_optimization.py example 1)."""
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=20)
        bank = build_pixel_bank(tiny_scene)
        gt = tiny_scene.poses
        state = create_pose_opt_state(jax.random.PRNGKey(0), cfg, jnp.asarray(gt))
        chunk = make_pose_opt_chunk(cfg, steps=50)
        for _ in range(3):
            state, _ = chunk(state, bank, jax.random.PRNGKey(1))
        # poses may wander slightly while the radiance field is still
        # half-trained; "does not degrade" = stays within ~1 degree of GT
        # (noisy inits in these tests start at 2-3 degrees)
        assert _mean_rot_err(state, gt) < 1.0


class TestPoseOptCLI:
    def test_full_entry(self, tmp_path):
        from robust_nerf_tpu.training.train_pose_opt import main

        main([
            "--data_source", "synthetic", "--num_iters", "40",
            "--val_every", "40", "--save_every", "40", "--log_every", "20",
            "--batch_size", "128", "--num_samples", "8",
            "--num_samples_fine", "8", "--steps_per_scan", "20",
            "--output_dir", str(tmp_path), "--exp_name", "poseopt_cli",
            "--rotation_noise", "2.0", "--noise_seed", "1",
            "--pose_opt_delay", "10",
        ])
        out = tmp_path / "poseopt_cli"
        assert (out / "final_poses.npz").exists()
        assert (out / "final_pose_errors.json").exists()
        data = np.load(out / "final_poses.npz")
        assert set(data.files) == {"initial", "optimized", "ground_truth"}
        assert not np.allclose(data["initial"], data["ground_truth"])

    def test_severe_recovery_preset_resolution(self):
        import argparse

        from robust_nerf_tpu.training.train_pose_opt import (
            SEVERE_RECOVERY_PRESET,
            resolve_pose_opt_defaults,
        )

        def ns(**kw):
            base = dict(pose_lr=None, pose_opt_delay=None,
                        rotation_reg_weight=None, translation_reg_weight=None,
                        freq_anneal_iters=None, severe_recovery=False)
            base.update(kw)
            return argparse.Namespace(**base)

        # standard defaults = reference parity (config.py PoseOptConfig)
        a = resolve_pose_opt_defaults(ns())
        assert (a.pose_lr, a.pose_opt_delay) == (1e-4, 1000)
        assert (a.rotation_reg_weight, a.translation_reg_weight) == (0.01, 0.001)
        assert a.freq_anneal_iters == 0

        # the preset fills every unset flag
        a = resolve_pose_opt_defaults(ns(severe_recovery=True))
        for k, v in SEVERE_RECOVERY_PRESET.items():
            assert getattr(a, k) == v

        # explicit flags beat the preset
        a = resolve_pose_opt_defaults(
            ns(severe_recovery=True, pose_lr=5e-4, freq_anneal_iters=0)
        )
        assert a.pose_lr == 5e-4
        assert a.freq_anneal_iters == 0
        assert a.pose_opt_delay == 100


class TestFreqAnnealedPoseOpt:
    def test_annealed_chunk_runs(self, tiny_scene, tiny_config):
        cfg = tiny_config
        cfg.pose_opt = PoseOptConfig(pose_opt_delay=0, freq_anneal_iters=100)
        bank = build_pixel_bank(tiny_scene)
        noisy, _ = add_noise_to_poses(
            tiny_scene.poses, NoiseConfig(rotation_noise_deg=2.0, seed=0)
        )
        state = create_pose_opt_state(jax.random.PRNGKey(0), cfg, jnp.asarray(noisy))
        chunk = make_pose_opt_chunk(cfg, steps=10)
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(m["loss"])))
        assert float(jnp.linalg.norm(state.pose_params["rotation_deltas"])) > 0
