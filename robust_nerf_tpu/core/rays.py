"""Ray generation and along-ray sampling — pure jnp, static shapes.

Semantics match the reference (noisy_src/rays.py:17-333): OpenGL camera
convention (camera looks down -Z, X right, Y up in camera space), normalized
world-space directions, stratified depth sampling with per-bin jitter, and
inverse-CDF hierarchical resampling. All randomness is explicit PRNG keys.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def get_ray_directions(
    H: int,
    W: int,
    focal: float,
    center: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Per-pixel ray directions in the camera frame, shape (H, W, 3).

    Reference semantics: noisy_src/rays.py:17-64 — pixel grid with 'xy'
    indexing, dirs = [(i-cx)/f, -(j-cy)/f, -1].
    """
    if center is None:
        cx, cy = W / 2.0, H / 2.0
    else:
        cx, cy = center
    i = jnp.arange(W, dtype=jnp.float32)[None, :]   # (1, W) — x/column
    j = jnp.arange(H, dtype=jnp.float32)[:, None]   # (H, 1) — y/row
    dirs = jnp.stack(
        [
            jnp.broadcast_to((i - cx) / focal, (H, W)),
            jnp.broadcast_to(-(j - cy) / focal, (H, W)),
            -jnp.ones((H, W), dtype=jnp.float32),
        ],
        axis=-1,
    )
    return dirs


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray):
    """Transform camera-frame directions to world rays for one pose.

    Reference semantics: noisy_src/rays.py:67-99. Returns (rays_o, rays_d)
    with rays_d normalized and rays_o broadcast from the pose translation.
    Differentiable w.r.t. c2w (used by pose optimization).
    """
    rays_d = jnp.matmul(directions, c2w[:3, :3].T, precision="highest")
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays_batch(H: int, W: int, focal: float, c2w_batch: jnp.ndarray):
    """Rays for a batch of poses, shapes (N, H, W, 3).

    TPU-native replacement for the reference's per-pose Python loop
    (noisy_src/rays.py:102-142): one vmap over poses.
    """
    directions = get_ray_directions(H, W, focal)
    return jax.vmap(lambda p: get_rays(directions, p))(c2w_batch)


def get_rays_for_pixels(
    directions_grid: jnp.ndarray,   # (H, W, 3) camera-frame direction grid
    poses: jnp.ndarray,             # (B, 4, 4) per-ray camera-to-world
    us: jnp.ndarray,                # (B,) int pixel column
    vs: jnp.ndarray,                # (B,) int pixel row
):
    """Per-pixel rays with a per-ray pose — the differentiable-through-pose
    ray regeneration for joint pose optimization.

    TPU-native replacement for the reference's per-unique-image mask loop
    (noisy_src/data_pose_opt.py:83-148): a single gather + batched rotate,
    fixed shapes, fully differentiable w.r.t. `poses`.
    """
    dirs = directions_grid[vs, us]                       # (B, 3)
    rot = poses[:, :3, :3]                               # (B, 3, 3)
    rays_d = jnp.einsum("bij,bj->bi", rot, dirs, precision="highest")
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = poses[:, :3, 3]
    return rays_o, rays_d


def sample_along_rays(
    key: Optional[jax.Array],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    num_samples: int,
    perturb: bool = True,
    lindisp: bool = False,
):
    """Stratified sampling along rays (reference: noisy_src/rays.py:145-210).

    Returns (pts (..., S, 3), z_vals (..., S)). `perturb` must be a static
    Python bool; when True a PRNG key is required.
    """
    batch_shape = rays_o.shape[:-1]
    t_vals = jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.float32)
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    z_vals = jnp.broadcast_to(z_vals, batch_shape + (num_samples,))

    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, batch_shape + (num_samples,))
        z_vals = lower + (upper - lower) * t_rand

    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return pts, z_vals


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,       # (..., N) bin edges (z midpoints)
    weights: jnp.ndarray,    # (..., N-1)
    num_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Inverse-transform sampling from a piecewise-constant PDF.

    Reference semantics: noisy_src/rays.py:213-279 — +1e-5 weight floor,
    0-prepended CDF, searchsorted(right) inversion, linear interpolation with
    a denom<1e-5 guard. Deterministic (linspace u) when `det`.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    # Pin the CDF endpoint to exactly 1.0: f32 cumsum rounding can land the
    # last entry a ULP above 1, which would make u=1.0 (det mode's last
    # sample) miss the final bin. Normalizing by the final value keeps the
    # CDF monotone and matches the reference's recorded det-mode outputs.
    cdf = cdf / cdf[..., -1:]
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    batch_shape = cdf.shape[:-1]
    if det:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.float32)
        u = jnp.broadcast_to(u, batch_shape + (num_samples,))
    else:
        u = jax.random.uniform(key, batch_shape + (num_samples,))

    # Branchless CDF inversion via masked reductions over ONE compare mask.
    # searchsorted('right') would pick index i = #{b: cdf_b <= u}; because
    # cdf and bins are sorted, the four gathered interpolants are exactly:
    #   cdf_below  = max{cdf_b  : cdf_b <= u}          (cdf_0 = 0 anchors it)
    #   cdf_above  = min{cdf_b  : cdf_b >  u}          (fallback: last edge)
    #   bins_below / bins_above: same mask — bins and cdf share length N
    #   (cdf is the 0-prepended cumsum of the N-1 interior weights).
    # One (S, N) bool tensor + 4 VPU reductions — no per-element gathers
    # (slow on TPU) and no materialized one-hot tensors.
    mask = cdf[..., None, :] <= u[..., :, None]        # (..., S, N)
    big = jnp.float32(1e10)
    cdf_below = jnp.max(jnp.where(mask, cdf[..., None, :], -big), axis=-1)
    cdf_above = jnp.min(jnp.where(mask, big, cdf[..., None, :]), axis=-1)
    cdf_above = jnp.where(cdf_above >= big, cdf[..., -1:], cdf_above)
    bins_below = jnp.max(jnp.where(mask, bins[..., None, :], -big), axis=-1)
    bins_above = jnp.min(jnp.where(mask, big, bins[..., None, :]), axis=-1)
    bins_above = jnp.where(bins_above >= big, bins[..., -1:], bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    samples = bins_below + t * (bins_above - bins_below)
    return samples


def sample_hierarchical(
    key: Optional[jax.Array],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,      # (..., N_coarse)
    weights: jnp.ndarray,     # (..., N_coarse)
    num_samples_fine: int,
    det: bool = False,
    use_fused: bool = False,
):
    """Hierarchical resampling (reference: noisy_src/rays.py:282-333).

    PDF over coarse-bin midpoints with interior weights, fine z's detached
    (stop_gradient mirrors the reference's .detach(), rays.py:325), then
    merged + sorted with the coarse z's. `use_fused` routes the inversion
    through the Pallas kernel (ops/pallas/resample.py) — same math, no
    (B, S, N) intermediates.
    """
    z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    if use_fused:
        # lazy import: core must stay importable without the ops layer
        from ..experimental.pallas.resample import sample_pdf_fused

        z_samples = sample_pdf_fused(
            key, z_vals_mid, weights[..., 1:-1], num_samples_fine, det=det
        )
    else:
        z_samples = sample_pdf(
            key, z_vals_mid, weights[..., 1:-1], num_samples_fine, det=det
        )
    z_samples = jax.lax.stop_gradient(z_samples)

    z_vals_fine = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    pts_fine = rays_o[..., None, :] + rays_d[..., None, :] * z_vals_fine[..., :, None]
    return pts_fine, z_vals_fine
