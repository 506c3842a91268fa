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
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            np.asarray(state.pose_params["rotation_deltas"]), 0.0, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(state.pose_params["translation_deltas"]), 0.0, atol=1e-9
        )
        assert np.all(np.asarray(m["pose_opt_active"]) == 0.0)

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
