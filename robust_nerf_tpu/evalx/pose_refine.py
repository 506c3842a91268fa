"""Test-time camera-pose refinement against a frozen scene.

The validation protocol for joint pose-scene optimization has a gauge
problem the literature resolves with *test-time pose refinement* (BARF,
Lin et al. 2021; NeRF-- and successors): the recovered scene lives in a
slightly different gauge than the ground-truth val cameras, so rendering
GT val poses against it under-reports scene quality — at a ~50 dB ceiling,
catastrophically (~10 dB per 0.1 deg; results/northstar_r5/
wander_sweep.json measures the curve). Refining each val camera's 6-DOF
pose by photometric gradient descent against the FROZEN scene removes
exactly the camera-error term while leaving scene quality untouched: 6
parameters per camera cannot fake texture detail against H*W pixels.

No reference counterpart (the reference's evaluate_with_poses renders GT
val poses directly, noisy_src/train_pose_opt.py:473-545 — fine at its
25 dB ceiling); used by scripts/northstar_check.py for the
`target_met_full` criterion and available programmatically.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import NeRFConfig
from ..core.rays import get_ray_directions, get_rays_for_pixels
from ..core.se3 import apply_pose_deltas
from ..models.nerf import model_apply_fn
from ..ops.rendering import render_rays, resolve_fused_resample


def make_refine_chunk(
    cfg: NeRFConfig, H: int, W: int, focal: float,
    batch_size: int, lr: float,
):
    """Jitted scanned chunk of pose-only photometric refinement steps
    (closure over the configs — NeRFConfig is mutable, so it cannot ride
    as a static jit arg the way the frozen sub-configs can)."""
    apply_fn = model_apply_fn(cfg.model)
    opt = optax.adam(lr)

    @partial(jax.jit, static_argnames=("steps",))
    def chunk(models, pose_params, opt_state, initial_poses, images, key,
              steps: int):
        directions = get_ray_directions(H, W, focal)
        n_img = initial_poses.shape[0]

        def loss_fn(pp, batch_idx, us, vs, key):
            poses = apply_pose_deltas(
                initial_poses, pp["rotation_deltas"], pp["translation_deltas"]
            )
            rays_o, rays_d = get_rays_for_pixels(
                directions, poses[batch_idx], us, vs
            )
            out = render_rays(
                models, rays_o, rays_d, key, cfg.render, cfg.model,
                is_train=False,
                compute_dtype=jnp.dtype(cfg.tpu.compute_dtype),
                apply_fn=apply_fn,
                fused_resample=resolve_fused_resample(cfg.tpu.fused_resample),
            )
            rgb = out.get("rgb_fine", out["rgb_coarse"])
            target = images[batch_idx, vs, us]
            return jnp.mean((rgb - target) ** 2)

        def one(carry, i):
            pp, st = carry
            k = jax.random.fold_in(key, i)
            k1, k2, k3, k4 = jax.random.split(k, 4)
            batch_idx = jax.random.randint(k1, (batch_size,), 0, n_img)
            us = jax.random.randint(k2, (batch_size,), 0, W)
            vs = jax.random.randint(k3, (batch_size,), 0, H)
            loss, g = jax.value_and_grad(loss_fn)(pp, batch_idx, us, vs, k4)
            updates, st = opt.update(g, st, pp)
            pp = optax.apply_updates(pp, updates)
            return (pp, st), loss

        (pose_params, opt_state_out), losses = jax.lax.scan(
            one, (pose_params, opt_state), jnp.arange(steps)
        )
        return pose_params, opt_state_out, losses

    return chunk


def refine_poses(
    models,
    cfg: NeRFConfig,
    poses: np.ndarray,        # (N, 4, 4) initial camera-to-world guesses
    images: np.ndarray,       # (N, H, W, 3) the frames to register against
    H: int,
    W: int,
    focal: float,
    iters: int = 600,
    batch_size: int = 4096,
    lr: float = 3e-3,
    steps_per_scan: int = 100,
    seed: int = 0,
) -> Tuple[np.ndarray, Dict[str, float]]:
    """Refine N camera poses against a frozen scene; returns (poses, info).

    Joint over all cameras (each has its own 6-DOF delta; batches mix
    pixels from all frames). Scene parameters receive no gradient.
    """
    pose_params = {
        "rotation_deltas": jnp.zeros((poses.shape[0], 3), jnp.float32),
        "translation_deltas": jnp.zeros((poses.shape[0], 3), jnp.float32),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(pose_params)
    images_j = jnp.asarray(images, jnp.float32)
    init = jnp.asarray(poses, jnp.float32)
    chunk = make_refine_chunk(cfg, H, W, float(focal), batch_size, lr)
    losses = []
    i = 0
    while i < iters:
        n = min(steps_per_scan, iters - i)
        pose_params, opt_state, ls = chunk(
            models, pose_params, opt_state, init, images_j,
            jax.random.PRNGKey(seed + i), n,
        )
        losses.extend(np.asarray(ls).tolist())
        i += n
    refined = np.asarray(
        jax.device_get(
            apply_pose_deltas(
                init,
                pose_params["rotation_deltas"],
                pose_params["translation_deltas"],
            )
        )
    )
    info = {
        "iters": iters,
        "first_loss": float(losses[0]),
        "final_loss": float(losses[-1]),
        "delta_rot_norm": float(
            jnp.linalg.norm(pose_params["rotation_deltas"], axis=-1).mean()
        ),
        "delta_trans_norm": float(
            jnp.linalg.norm(pose_params["translation_deltas"], axis=-1).mean()
        ),
    }
    return refined, info
