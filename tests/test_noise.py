"""Noise-injection tests — seeded reproducibility + statistical contracts."""

import numpy as np

from robust_nerf_tpu.core.noise import (
    NoiseConfig,
    add_noise_to_pose,
    add_noise_to_poses,
    compute_pose_error,
    random_rotation_matrix,
)


def _ring_poses(n=30, radius=4.0):
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    poses[:, 0, 3] = radius * np.cos(th)
    poses[:, 1, 3] = radius * np.sin(th)
    return poses


class TestNoiseConfig:
    def test_str_naming(self):
        """Experiment-name fragments (reference: noisy_src/noise.py:27-37)."""
        assert str(NoiseConfig()) == "clean"
        assert str(NoiseConfig(rotation_noise_deg=5.0)) == "rot5.0deg"
        assert str(NoiseConfig(translation_noise_pct=5.0)) == "trans5.0pct"
        assert (
            str(NoiseConfig(rotation_noise_deg=5.0, translation_noise_pct=5.0))
            == "rot5.0deg_trans5.0pct"
        )
        assert str(NoiseConfig(translation_noise=0.01)) == "trans0.010"

    def test_pct_conversion(self):
        nc = NoiseConfig(translation_noise_pct=5.0)
        assert abs(nc.get_translation_std(4.0) - 0.2) < 1e-9
        nc_abs = NoiseConfig(translation_noise=0.03)
        assert nc_abs.get_translation_std(4.0) == 0.03

    def test_has_noise(self):
        assert not NoiseConfig().has_noise
        assert NoiseConfig(rotation_noise_deg=1.0).has_noise


class TestRotationNoise:
    def test_identity_at_zero(self):
        rng = np.random.default_rng(0)
        np.testing.assert_allclose(random_rotation_matrix(0.0, rng), np.eye(3))

    def test_valid_rotation(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            R = random_rotation_matrix(5.0, rng)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_angle_statistics(self):
        """Applied angle std tracks the requested std (|angle| of a Gaussian)."""
        rng = np.random.default_rng(2)
        angles = []
        for _ in range(500):
            R = random_rotation_matrix(5.0, rng)
            ang = np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))
            angles.append(ang)
        # |N(0, 5 deg)| has mean 5*sqrt(2/pi) ~ 3.99 deg
        assert 3.0 < np.mean(angles) < 5.0


class TestAddNoise:
    def test_seeded_reproducibility(self):
        poses = _ring_poses()
        nc = NoiseConfig(rotation_noise_deg=5.0, translation_noise_pct=5.0, seed=123)
        a, _ = add_noise_to_poses(poses, nc)
        b, _ = add_noise_to_poses(poses, nc)
        np.testing.assert_array_equal(a, b)
        c, _ = add_noise_to_poses(poses, NoiseConfig(
            rotation_noise_deg=5.0, translation_noise_pct=5.0, seed=124))
        assert not np.allclose(a, c)

    def test_noise_info(self):
        rng = np.random.default_rng(0)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0, 0, 4]
        noisy, info = add_noise_to_pose(pose, 3.0, 0.1, rng=rng)
        assert "actual_rotation_deg" in info
        assert "actual_translation_norm" in info
        err = compute_pose_error(pose, noisy)
        np.testing.assert_allclose(
            err["rotation_error_deg"], info["actual_rotation_deg"], atol=1e-3
        )

    def test_left_frame_rotation(self):
        """R_noisy = R_noise @ R (world-frame perturb,
        reference: noisy_src/noise.py:171-174)."""
        rng = np.random.default_rng(5)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        noisy, _ = add_noise_to_pose(pose, 5.0, 0.0, rng=rng)
        R_noise = noisy[:3, :3] @ pose[:3, :3].T
        np.testing.assert_allclose(R_noise @ R_noise.T, np.eye(3), atol=1e-5)

    def test_pct_scales_with_distance(self):
        """%-based translation noise converts per-pose using camera distance
        (reference: noisy_src/noise.py:218-224)."""
        n = 400
        poses = _ring_poses(n, radius=4.0)
        nc = NoiseConfig(translation_noise_pct=5.0, seed=0)
        noisy, infos = add_noise_to_poses(poses, nc)
        trans_norms = [i["actual_translation_norm"] for i in infos]
        # std per-axis = 0.2; 3D norm mean = 0.2*sqrt(2)*gamma(2)/gamma(1.5) ~ 0.319
        assert 0.25 < np.mean(trans_norms) < 0.40

    def test_recorded_noise_stats_golden(self):
        """Frozen noise statistics for seed 42 (10 identity-rot poses at
        distance 4, 5 deg + 5% noise). The seeded noise path must stay
        bit-stable across refactors — any drift breaks run reproducibility
        claims (reference contract: set_noise_seed, noisy_src/noise.py:65-68)."""
        import jax.numpy as jnp

        from robust_nerf_tpu.core.se3 import pose_errors

        poses = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
        poses[:, 2, 3] = 4.0
        nc = NoiseConfig(rotation_noise_deg=5.0, translation_noise_pct=5.0,
                         seed=42)
        noisy, _ = add_noise_to_poses(poses, nc)
        errs = pose_errors(jnp.asarray(noisy), jnp.asarray(poses))
        golden = {
            "mean_rotation_error_deg": 2.4527766704559326,
            "max_rotation_error_deg": 5.644863605499268,
            "std_rotation_error_deg": 1.3967602252960205,
            "mean_translation_error": 0.2464648336172104,
            "max_translation_error": 0.46983200311660767,
            "std_translation_error": 0.09155124425888062,
        }
        for k, v in golden.items():
            np.testing.assert_allclose(float(np.asarray(errs[k])), v,
                                       rtol=1e-5, err_msg=k)

    def test_error_statistics_match_injected(self):
        poses = _ring_poses(200)
        nc = NoiseConfig(rotation_noise_deg=5.0, seed=9)
        noisy, _ = add_noise_to_poses(poses, nc)
        errs = [
            compute_pose_error(poses[i], noisy[i])["rotation_error_deg"]
            for i in range(200)
        ]
        assert 3.0 < np.mean(errs) < 5.0
