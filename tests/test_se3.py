"""SE(3)/SO(3) math tests — exp-map vs closed form, gradients at zero."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_nerf_tpu.core.se3 import (
    apply_pose_deltas,
    exp_so3,
    log_so3,
    pose_errors,
    rotation_geodesic_error_deg,
    skew,
)


def _rodrigues_np(w):
    """Closed-form Rodrigues in numpy for golden comparison."""
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    axis = w / theta
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class TestExpSO3:
    def test_zero_is_identity(self):
        R = np.asarray(exp_so3(jnp.zeros((5, 3))))
        np.testing.assert_allclose(R, np.tile(np.eye(3), (5, 1, 1)), atol=1e-6)

    def test_matches_closed_form(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((20, 3)).astype(np.float32)
        R = np.asarray(exp_so3(jnp.asarray(w)))
        for i in range(20):
            np.testing.assert_allclose(R[i], _rodrigues_np(w[i]), atol=1e-5)

    def test_orthonormal(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((50, 3)).astype(np.float32) * 2.0
        R = np.asarray(exp_so3(jnp.asarray(w)))
        prod = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(prod, np.tile(np.eye(3), (50, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_tiny_angles_accurate(self):
        w = jnp.array([[1e-8, 0, 0], [0, 1e-7, 1e-7]])
        R = np.asarray(exp_so3(w))
        for i, wi in enumerate(np.asarray(w)):
            np.testing.assert_allclose(R[i], _rodrigues_np(wi), atol=1e-9)

    def test_grad_finite_at_zero(self):
        """The pose-opt init point: gradient must be finite (the reference's
        identity-snap at small angles kills it; our Taylor guard doesn't)."""
        g = jax.grad(lambda w: jnp.sum(exp_so3(w) ** 2))(jnp.zeros((3, 3)))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_grad_matches_fd(self):
        """Autodiff gradient vs float64 central differences of the
        closed-form Rodrigues (f32 FD would drown in cancellation noise)."""
        w0 = np.array([0.3, -0.2, 0.5])
        g = np.asarray(
            jax.grad(lambda w: jnp.sum(jnp.sin(exp_so3(w))))(
                jnp.asarray(w0[None].astype(np.float32))
            )
        )[0]
        f64 = lambda w: np.sum(np.sin(_rodrigues_np(w)))
        eps = 1e-6
        for k in range(3):
            d = np.zeros(3)
            d[k] = eps
            fd = (f64(w0 + d) - f64(w0 - d)) / (2 * eps)
            np.testing.assert_allclose(g[k], fd, rtol=1e-3, atol=1e-5)


class TestLogSO3:
    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        w = rng.standard_normal((20, 3)).astype(np.float32)
        # keep |angle| < pi for uniqueness
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, (20, 1))
        w_rt = np.asarray(log_so3(exp_so3(jnp.asarray(w.astype(np.float32)))))
        np.testing.assert_allclose(w_rt, w, atol=1e-4)

    def test_near_pi_rotations(self):
        """sin(theta) also vanishes at theta ~ pi, where the off-diagonal
        formula returns ~0; the diagonal-based branch must recover the
        axis-angle up to the exp(pi a) = exp(-pi a) sign ambiguity."""
        rng = np.random.default_rng(3)
        axes = rng.standard_normal((12, 3)).astype(np.float32)
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        for angle in (np.pi, np.pi - 1e-4, np.pi - 1e-6, -np.pi + 1e-5):
            w = (axes * np.float32(angle)).astype(np.float32)
            R = exp_so3(jnp.asarray(w))
            w_rt = np.asarray(log_so3(R))
            # compare the ROTATIONS (log is sign-ambiguous at the cut)
            R_rt = np.asarray(exp_so3(jnp.asarray(w_rt)))
            np.testing.assert_allclose(R_rt, np.asarray(R), atol=5e-3)
            # magnitude must be ~|angle|, not ~0 (the old failure mode)
            np.testing.assert_allclose(
                np.linalg.norm(w_rt, axis=-1), abs(angle), atol=5e-3
            )

    def test_near_pi_overall_sign(self):
        """theta in (177.4 deg, pi) is inside the diagonal-based branch but
        NOT sign-ambiguous: the antisymmetric part (magnitude 2 sin theta)
        still fixes the overall sign. A branch that forces the dominant
        axis component positive returns -w there, i.e. exp(log(R)) = R^T
        (~4-5 deg round-trip rotation error). Probe axes whose dominant
        component is NEGATIVE, well away from the 1e-4 neighborhood of pi."""
        axes = np.array(
            [
                [-0.9, 0.3, 0.2],
                [0.1, -0.95, 0.25],
                [0.2, 0.3, -0.9],
                [-0.7, -0.5, 0.4],
                [0.3, -0.6, -0.7],
            ],
            dtype=np.float32,
        )
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        for angle_deg in (178.0, -178.0, 179.0, -179.5, 177.6):
            angle = np.float32(np.deg2rad(angle_deg))
            w = (axes * angle).astype(np.float32)
            R = exp_so3(jnp.asarray(w))
            w_rt = np.asarray(log_so3(R))
            # exact round-trip: log is single-valued away from theta = pi,
            # so w itself (sign included) must come back.
            np.testing.assert_allclose(w_rt, w, atol=2e-3)
            # and the rotation itself must round-trip tightly (R, not R^T)
            R_rt = np.asarray(exp_so3(jnp.asarray(w_rt)))
            np.testing.assert_allclose(R_rt, np.asarray(R), atol=1e-4)


class TestSkew:
    def test_antisymmetric_and_cross(self):
        v = jnp.array([[1.0, 2.0, 3.0]])
        K = np.asarray(skew(v))[0]
        np.testing.assert_allclose(K, -K.T, atol=1e-7)
        u = np.array([0.5, -1.0, 2.0])
        np.testing.assert_allclose(K @ u, np.cross([1.0, 2.0, 3.0], u), atol=1e-6)


class TestApplyPoseDeltas:
    def test_zero_deltas_identity(self):
        rng = np.random.default_rng(3)
        poses = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
        poses[:, :3, 3] = rng.standard_normal((4, 3))
        out = np.asarray(
            apply_pose_deltas(jnp.asarray(poses), jnp.zeros((4, 3)), jnp.zeros((4, 3)))
        )
        np.testing.assert_allclose(out, poses, atol=1e-6)

    def test_left_multiply_convention(self):
        """R_new = exp(w) @ R_init; t_new = t_init + dt
        (reference: train_pose_opt.py:186-226)."""
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = _rodrigues_np(np.array([0.0, 0.0, 0.4])).astype(np.float32)
        w = np.array([[0.2, 0.0, 0.0]], dtype=np.float32)
        dt = np.array([[0.1, 0.2, 0.3]], dtype=np.float32)
        out = np.asarray(
            apply_pose_deltas(jnp.asarray(pose[None]), jnp.asarray(w), jnp.asarray(dt))
        )[0]
        expected_R = _rodrigues_np(w[0]) @ pose[:3, :3]
        np.testing.assert_allclose(out[:3, :3], expected_R, atol=1e-5)
        np.testing.assert_allclose(out[:3, 3], pose[:3, 3] + dt[0], atol=1e-6)
        np.testing.assert_allclose(out[3], [0, 0, 0, 1], atol=1e-7)


class TestPoseErrors:
    def test_zero_for_identical(self):
        poses = jnp.tile(jnp.eye(4), (3, 1, 1))
        errs = pose_errors(poses, poses)
        assert float(errs["mean_rotation_error_deg"]) < 1e-3
        assert float(errs["mean_translation_error"]) < 1e-6

    def test_known_rotation(self):
        a = jnp.tile(jnp.eye(4), (1, 1, 1))
        R = _rodrigues_np(np.array([0.0, 0.0, np.deg2rad(5.0)]))
        b = np.eye(4, dtype=np.float32)
        b[:3, :3] = R.astype(np.float32)
        err = rotation_geodesic_error_deg(a[:, :3, :3], jnp.asarray(b[None, :3, :3]))
        np.testing.assert_allclose(float(err[0]), 5.0, atol=1e-2)

    def test_translation_error(self):
        a = jnp.tile(jnp.eye(4), (1, 1, 1))
        b = jnp.eye(4).at[:3, 3].set(jnp.array([3.0, 4.0, 0.0]))[None]
        errs = pose_errors(a, b)
        np.testing.assert_allclose(float(errs["mean_translation_error"]), 5.0, atol=1e-5)


class TestUmeyamaAlignment:
    def test_pure_gauge_removed(self):
        """A global SIM(3) applied to all poses must align away exactly."""
        from robust_nerf_tpu.core.se3 import align_poses_umeyama

        rng = np.random.default_rng(0)
        gt = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
        for i in range(10):
            gt[i, :3, :3] = _rodrigues_np(rng.standard_normal(3)).astype(np.float32)
            gt[i, :3, 3] = rng.standard_normal(3) * 4
        Rg = _rodrigues_np(np.array([0.02, 0.01, -0.015]))
        est = np.array(gt, copy=True)
        est[:, :3, 3] = (1.05 * (Rg @ gt[:, :3, 3].T)).T + [0.3, -0.2, 0.1]
        est[:, :3, :3] = np.einsum("ij,njk->nik", Rg, gt[:, :3, :3])

        aligned, xform = align_poses_umeyama(est, gt)
        errs = pose_errors(jnp.asarray(aligned), jnp.asarray(gt))
        assert float(errs["mean_rotation_error_deg"]) < 1e-3
        assert float(errs["mean_translation_error"]) < 1e-5
        np.testing.assert_allclose(xform["scale"], 1 / 1.05, rtol=1e-5)

    def test_identity_when_aligned(self):
        from robust_nerf_tpu.core.se3 import align_poses_umeyama

        rng = np.random.default_rng(1)
        gt = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
        gt[:, :3, 3] = rng.standard_normal((8, 3)) * 3
        aligned, xform = align_poses_umeyama(gt, gt)
        np.testing.assert_allclose(aligned, gt, atol=1e-5)
        np.testing.assert_allclose(xform["scale"], 1.0, atol=1e-6)
