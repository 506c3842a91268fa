"""SE(3) / SO(3) math — vectorized, differentiable, jit-safe.

Replaces the reference's CameraPoseParameters nn.Module math
(noisy_src/train_pose_opt.py:122-271) with pure functions over (N, 3)
axis-angle and translation delta arrays. The small-angle branch is a
`where` select (no data-dependent control flow), so the whole exp-map is
one fused XLA program and its gradient is finite at theta = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL_ANGLE = 1e-6


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrices from vectors, (..., 3) -> (..., 3, 3).

    Reference semantics: noisy_src/train_pose_opt.py:165-184.
    """
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential map via Rodrigues' formula, (..., 3) -> (..., 3, 3).

    Reference semantics: noisy_src/train_pose_opt.py:122-163, but the
    small-angle case uses the exact Taylor coefficients sin(t)/t and
    (1-cos t)/t^2 instead of snapping to identity, so gradients through
    zero rotation (the pose-opt initialization!) are correct.
    """
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1)
    # Clamped theta in BOTH branches: `where` evaluates (and differentiates)
    # the untaken branch, so an unclamped 1/theta2 at theta=0 would emit
    # inf whose backward is 0*inf = NaN — exactly at the pose-opt init.
    theta2_safe = jnp.maximum(theta2, _SMALL_ANGLE**2)
    theta = jnp.sqrt(theta2_safe)
    small = theta2 < _SMALL_ANGLE**2

    # sin(t)/t and (1-cos t)/t^2, Taylor-guarded for t -> 0.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)

    K = skew(axis_angle)   # = theta * skew(axis)
    # precision='highest': XLA's default matmul path trades precision for
    # speed (bf16-class error ~1e-3 on TPU and oneDNN CPU) — fatal for
    # sub-degree pose math. Geometry always runs full f32.
    K2 = jnp.matmul(K, K, precision="highest")
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map, (..., 3, 3) -> (..., 3) axis-angle (|angle| <= pi).

    sin(theta) vanishes at BOTH ends of the domain: near theta=0 the
    off-diagonal formula is Taylor-stabilized; near theta=pi the
    off-diagonals vanish but the axis survives in the diagonal of
    R + I = 2 cos^2(theta/2) I + (1 - cos theta) aa^T ~ 2 aa^T, so the
    axis is recovered from sqrt of the diagonal with signs from the
    symmetric off-diagonal part (a_i a_j terms)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Off-diagonal antisymmetric part gives axis * 2 sin(theta).
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = sin_theta < _SMALL_ANGLE
    # The off-diagonal signal has magnitude 2 sin(theta); with f32 matrix
    # entries its noise floor is ~1e-6, and the TRACE's noise alone makes
    # the computed sin(theta) ~1e-3 at a true pi rotation — so the
    # diagonal-based branch must take over well before sin reaches the
    # tiny-angle guard. cos < -0.999 (theta > 177.4 deg) keeps both
    # branches well-conditioned at the handover.
    near_pi = cos_theta < -0.999
    scale = jnp.where(
        small, 0.5 + theta * theta / 12.0, theta / (2.0 * jnp.where(small, 1.0, sin_theta))
    )
    w_generic = w * scale[..., None]

    # theta ~ pi branch: R_ii = cos + (1-cos) a_i^2 gives |a_i|; relative
    # signs come from the symmetric part S_ij = (1-cos) a_i a_j (i != j).
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    one_minus_cos = jnp.maximum(1.0 - cos_theta[..., None], _SMALL_ANGLE)
    axis_abs = jnp.sqrt(jnp.clip((diag - cos_theta[..., None]) / one_minus_cos,
                                 0.0))
    k = jnp.argmax(axis_abs, axis=-1)                        # dominant index
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    sym_k = jnp.take_along_axis(S, k[..., None, None], axis=-2)[..., 0, :]
    signs = jnp.where(
        jnp.arange(3) == k[..., None],
        1.0,
        jnp.sign(sym_k) + (sym_k == 0.0),   # sign with 0 -> +1
    )
    axis_signed = signs * axis_abs
    # The diagonal/symmetric parts only determine the axis up to +-; the
    # OVERALL sign still lives in the antisymmetric part w = 2 sin(theta) a,
    # which is nonzero everywhere in this branch except theta = pi exactly
    # (|w| ~ 0.09 at the 177.4 deg handover). Project w onto the candidate
    # axis; only when that signal is below the f32 noise floor (true pi,
    # where exp(pi a) = exp(-pi a) anyway) fall back to +1.
    w_dot = jnp.sum(w * axis_signed, axis=-1)
    overall = jnp.where(jnp.abs(w_dot) > 1e-5, jnp.sign(w_dot), 1.0)
    w_pi = overall[..., None] * axis_signed * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def apply_pose_deltas(
    initial_poses: jnp.ndarray,      # (N, 4, 4)
    rotation_deltas: jnp.ndarray,    # (N, 3) axis-angle
    translation_deltas: jnp.ndarray, # (N, 3)
) -> jnp.ndarray:
    """Compose learned SE(3) deltas onto initial camera-to-world poses.

    R_opt = exp(omega) @ R_init ; t_opt = t_init + dt — the reference's
    left/world-frame convention (noisy_src/train_pose_opt.py:186-226).
    """
    R_delta = exp_so3(rotation_deltas)                      # (N, 3, 3)
    R_new = jnp.einsum("nij,njk->nik", R_delta, initial_poses[:, :3, :3],
                       precision="highest")
    t_new = initial_poses[:, :3, 3] + translation_deltas
    poses = jnp.broadcast_to(
        jnp.eye(4, dtype=initial_poses.dtype), initial_poses.shape
    )
    poses = poses.at[:, :3, :3].set(R_new)
    poses = poses.at[:, :3, 3].set(t_new)
    return poses


def fit_sim3_centers(
    centers_a: jnp.ndarray,          # (N, 3)
    centers_b: jnp.ndarray,          # (N, 3)
    with_scale: bool = True,
    fit_rotation: bool = True,
):
    """Closed-form similarity transform mapping centers_a -> centers_b.

    jit-safe Umeyama (SVD of a 3x3 covariance): returns (s, R, t) with
    b ~= s * R @ a + t. `fit_rotation=False` restricts to translation+scale
    (R = I) — used when camera orientations are frozen, so a rotation gauge
    cannot drift and must not be "corrected". Float32; the 3x3 SVD is
    negligible next to rendering.
    """
    mu_a = jnp.mean(centers_a, axis=0)
    mu_b = jnp.mean(centers_b, axis=0)
    ac = centers_a - mu_a
    bc = centers_b - mu_b
    n = centers_a.shape[0]
    var_a = jnp.sum(ac * ac) / n
    var_a = jnp.maximum(var_a, 1e-12)
    if fit_rotation:
        cov = jnp.matmul(bc.T, ac, precision="highest") / n
        U, D, Vt = jnp.linalg.svd(cov)
        det_sign = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
        S = jnp.array([1.0, 1.0, 0.0]) + jnp.array([0.0, 0.0, 1.0]) * det_sign
        R = jnp.matmul(U * S[None, :], Vt, precision="highest")
        trace_DS = jnp.sum(D * S)
    else:
        R = jnp.eye(3, dtype=centers_a.dtype)
        trace_DS = jnp.sum(bc * ac) / n
    if with_scale:
        s = trace_DS / var_a
    else:
        s = jnp.ones((), centers_a.dtype)
    t = mu_b - s * jnp.matmul(R, mu_a, precision="highest")
    return s, R, t


def project_gauge_deltas(
    initial_poses: jnp.ndarray,       # (N, 4, 4)
    rotation_deltas: jnp.ndarray,     # (N, 3)
    translation_deltas: jnp.ndarray,  # (N, 3)
    fit_rotation: bool = True,
    with_scale: bool = True,
):
    """Remove the global SIM(3) gauge component from accumulated pose deltas.

    Joint pose+scene optimization is flat along a global similarity of
    world+cameras, so SGD noise makes the whole constellation RANDOM-WALK
    away from the initial gauge while per-camera (relative) errors improve
    — the round-3 failure mode (VERDICT.md "What's weak" #1: raw pose error
    and val PSNR degrade with iters while aligned error improves). This
    projection re-anchors: fit the similarity A mapping current camera
    centers onto the INITIAL centers (no ground truth involved) and fold A
    into the deltas, so the constellation stays expressed in the init
    gauge. Per-camera relative corrections are untouched (left-composing a
    global transform preserves all relative poses; scale rescales pairwise
    distances uniformly).

    Applied after every pose-optimizer update (training/steps.py). The
    remaining raw-vs-GT gauge offset is then the Karcher mean of the
    injected noise, O(sigma/sqrt(N)) — the information-theoretic floor,
    since the init poses are the only gauge observations.

    Returns the projected {"rotation_deltas", "translation_deltas"}.
    """
    R_delta = exp_so3(rotation_deltas)
    t_init = initial_poses[:, :3, 3]
    t_cur = t_init + translation_deltas
    s, R_A, t_A = fit_sim3_centers(
        t_cur, t_init, with_scale=with_scale, fit_rotation=fit_rotation
    )
    t_new = s * jnp.einsum("ij,nj->ni", R_A, t_cur, precision="highest") + t_A
    if fit_rotation:
        R_new_delta = jnp.einsum("ij,njk->nik", R_A, R_delta,
                                 precision="highest")
        rot_new = log_so3(R_new_delta)
    else:
        rot_new = rotation_deltas
    return {
        "rotation_deltas": rot_new,
        "translation_deltas": t_new - t_init,
    }


def apply_sim3_inverse_to_poses(poses: jnp.ndarray, xform: dict) -> jnp.ndarray:
    """Map poses from the target gauge of `xform` back into its source gauge.

    `xform` is the {"rotation", "translation", "scale"} dict returned by
    align_poses_umeyama (maps estimated gauge -> GT gauge). Applying the
    INVERSE to GT-gauge validation cameras expresses them in the scene's
    (estimated) gauge, so validation renders view the reconstructed scene
    from the geometrically-corresponding viewpoint. Experiment-mode only
    (the fit uses GT train poses); reported alongside the raw protocol.
    """
    import numpy as np

    R = np.asarray(xform["rotation"], np.float64)
    t = np.asarray(xform["translation"], np.float64)
    s = float(xform["scale"])
    p = np.asarray(poses, np.float64)
    out = np.array(p, copy=True)
    out[:, :3, 3] = (R.T @ (p[:, :3, 3] - t).T).T / s
    out[:, :3, :3] = np.einsum("ij,njk->nik", R.T, p[:, :3, :3])
    return out.astype(np.float32)


def align_poses_umeyama(poses_est, poses_gt, with_scale: bool = True):
    """Globally align estimated camera poses to GT (Umeyama/Procrustes).

    Joint pose+scene optimization only determines poses up to a global
    SIM(3) gauge — the photometric loss is invariant to rotating/translating
    /scaling world+cameras together. Standard practice (BARF et al.) is to
    align camera centers with a closed-form similarity transform before
    reporting pose errors. Host-side numpy (evaluation only).

    Returns (aligned_poses (N,4,4) np.float32, {"rotation","translation",
    "scale"}).
    """
    import numpy as np

    est = np.asarray(poses_est, dtype=np.float64)
    gt = np.asarray(poses_gt, dtype=np.float64)
    x = est[:, :3, 3]            # (N, 3) estimated camera centers
    y = gt[:, :3, 3]
    mu_x = x.mean(0)
    mu_y = y.mean(0)
    xc = x - mu_x
    yc = y - mu_y
    cov = yc.T @ xc / x.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_x = (xc**2).sum() / x.shape[0]
        s = float(np.trace(np.diag(D) @ S) / var_x) if var_x > 0 else 1.0
    else:
        s = 1.0
    t = mu_y - s * R @ mu_x

    aligned = np.array(est, copy=True)
    aligned[:, :3, 3] = (s * (R @ x.T)).T + t
    aligned[:, :3, :3] = np.einsum("ij,njk->nik", R, est[:, :3, :3])
    return aligned.astype(np.float32), {"rotation": R, "translation": t, "scale": s}


def rotation_geodesic_error_deg(R_a: jnp.ndarray, R_b: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between rotation matrices, in degrees, batched.

    Reference semantics: noisy_src/noise.py:237-258 — arccos((tr(Ra^T Rb)-1)/2).
    """
    R_diff = jnp.einsum("...ji,...jk->...ik", R_a, R_b,
                        precision="highest")  # Ra^T @ Rb
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    angle = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    return angle * (180.0 / jnp.pi)


def pose_errors(poses_a: jnp.ndarray, poses_b: jnp.ndarray) -> dict:
    """Per-pose rotation (deg) and translation (Euclidean) errors + stats.

    Vectorized replacement for the reference's per-pose Python loop
    (noisy_src/train_pose_opt.py:232-271).
    """
    rot_err = rotation_geodesic_error_deg(poses_a[:, :3, :3], poses_b[:, :3, :3])
    trans_err = jnp.linalg.norm(poses_a[:, :3, 3] - poses_b[:, :3, 3], axis=-1)
    return {
        "rotation_errors_deg": rot_err,
        "translation_errors": trans_err,
        "mean_rotation_error_deg": jnp.mean(rot_err),
        "max_rotation_error_deg": jnp.max(rot_err),
        "std_rotation_error_deg": jnp.std(rot_err),
        "mean_translation_error": jnp.mean(trans_err),
        "max_translation_error": jnp.max(trans_err),
        "std_translation_error": jnp.std(trans_err),
    }
