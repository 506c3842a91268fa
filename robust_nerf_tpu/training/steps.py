"""Jitted train steps — standard (fixed-pose) and joint pose-opt paths.

TPU-native structure: batch sampling, rendering, loss, backward, and the
optimizer update are ONE XLA program; `train_chunk` scans `steps_per_scan`
of those per dispatch, so the host touches the device once per log interval
instead of once per iteration (the reference dispatches dozens of kernels
per step and logs synchronously, noisy_src/train.py:450-520). Per-iteration
metrics still come back — stacked, one row per step.

Loss/optimizer semantics follow the reference: MSE(coarse)+MSE(fine), Adam,
lr decay 0.1^(step/(lr_decay*1000)) (train.py:68-119, 405-411); pose-opt
adds L2 delta regularization, a separate delayed Adam for poses, and
per-group gradient clipping (train_pose_opt.py:290-409).
"""

from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import NeRFConfig
from ..core.rays import get_rays_for_pixels
from ..core.se3 import apply_pose_deltas, project_gauge_deltas
from ..data.banks import (
    PixelBank,
    RayBank,
    make_sharded_pixel_sampler,
    make_sharded_ray_sampler,
    sample_pixel_batch,
    sample_ray_batch,
)
from ..evalx.metrics import psnr_from_mse
from ..models.nerf import create_nerf, nerf_apply
from ..ops.rendering import render_rays, resolve_fused_resample
from ..parallel.mesh import constrain_batch


class TrainState(NamedTuple):
    models: Dict[str, Any]      # {"coarse": params[, "fine": params]}
    opt_state: Any
    step: jnp.ndarray           # int32 scalar


class PoseOptState(NamedTuple):
    models: Dict[str, Any]
    pose_params: Dict[str, jnp.ndarray]   # rotation_deltas/translation_deltas (N,3)
    initial_poses: jnp.ndarray            # (N, 4, 4) — fixed
    opt_state: Any
    pose_opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(lr: float, lr_decay: int):
    """lr * 0.1^(step / (lr_decay*1000)) — reference train.py:405-411."""
    return optax.exponential_decay(
        init_value=lr, transition_steps=lr_decay * 1000, decay_rate=0.1
    )


def clip_by_norm_per_subtree(max_norm: float) -> optax.GradientTransformation:
    """Clip each TOP-LEVEL subtree (e.g. "coarse"/"fine") to its own global
    norm — the reference's pose-opt path clips each model separately
    (noisy_src/train_pose_opt.py:398-401), unlike the standard path which
    clips the combined renderer (train.py:115). Mirrors torch
    clip_grad_norm_: scale = min(1, max_norm / (norm + 1e-6))."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip_subtree(tree):
            g_norm = optax.global_norm(tree)
            scale = jnp.minimum(1.0, max_norm / (g_norm + 1e-6))
            return jax.tree_util.tree_map(lambda g: g * scale, tree)

        return {k: clip_subtree(v) for k, v in updates.items()}, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: NeRFConfig, per_model_clip: bool = False):
    schedule = make_lr_schedule(cfg.train.lr, cfg.train.lr_decay)
    clip = (
        clip_by_norm_per_subtree(cfg.train.grad_clip)
        if per_model_clip
        else optax.clip_by_global_norm(cfg.train.grad_clip)
    )
    return optax.chain(clip, optax.adam(schedule))


def make_pose_optimizer(cfg: NeRFConfig):
    po = cfg.pose_opt
    schedule = make_lr_schedule(po.pose_lr, cfg.train.lr_decay)
    return optax.chain(
        optax.clip_by_global_norm(po.pose_grad_clip),
        optax.adam(schedule),
    )


def create_train_state(key: jax.Array, cfg: NeRFConfig) -> TrainState:
    models = create_nerf(key, cfg.model, cfg.render.use_hierarchical)
    opt = make_optimizer(cfg)
    return TrainState(
        models=models,
        opt_state=opt.init(models),
        step=jnp.zeros((), jnp.int32),
    )


def create_pose_opt_state(
    key: jax.Array, cfg: NeRFConfig, initial_poses: jnp.ndarray
) -> PoseOptState:
    models = create_nerf(key, cfg.model, cfg.render.use_hierarchical)
    n = initial_poses.shape[0]
    pose_params = {
        "rotation_deltas": jnp.zeros((n, 3), jnp.float32),
        "translation_deltas": jnp.zeros((n, 3), jnp.float32),
    }
    return PoseOptState(
        models=models,
        pose_params=pose_params,
        initial_poses=jnp.asarray(initial_poses, jnp.float32),
        opt_state=make_optimizer(cfg, per_model_clip=True).init(models),
        pose_opt_state=make_pose_optimizer(cfg).init(pose_params),
        step=jnp.zeros((), jnp.int32),
    )


def _bank_is_sharded(cfg: NeRFConfig, mesh) -> bool:
    import numpy as _np

    return (
        bool(getattr(cfg.tpu, "shard_bank", False))
        and mesh is not None
        and int(_np.prod(mesh.devices.shape)) > 1
    )


def _apply_fn_for(cfg: NeRFConfig):
    """Select the MLP apply fn (XLA or fused Pallas) + optional remat.

    The fused kernel's custom VJP stores (params, pts, viewdirs) as
    residuals and recomputes activations per tile in VMEM (under
    ROBUST_NERF_PALLAS_STORE=1 it additionally stores the 8 (N, H) trunk
    activations — XLA-style store-and-read), so wrapping it in
    jax.checkpoint would only add a redundant forward pass — remat
    applies to the XLA path alone."""
    from ..experimental.pallas import pallas_enabled

    f8 = bool(getattr(cfg.tpu, "f8_residuals", False))
    if getattr(cfg.model, "architecture", "mlp") != "mlp":
        # Non-MLP families (hashgrid) resolve through the architecture
        # dispatcher; the Pallas fused kernels and f8 residuals implement
        # the frequency-MLP only.
        if cfg.tpu.use_pallas in ("on", True):
            warnings.warn(
                "TPUConfig.use_pallas='on' has no effect for architecture="
                f"{cfg.model.architecture!r} (fused kernels are MLP-only)",
                stacklevel=2,
            )
        from ..models.nerf import model_apply_fn

        fn = model_apply_fn(cfg.model)
        if cfg.tpu.remat:
            fn = jax.checkpoint(fn, static_argnums=(3, 4))
        return fn
    if pallas_enabled(cfg.tpu, context="train"):
        if f8:
            warnings.warn(
                "TPUConfig.f8_residuals is ignored when the fused Pallas "
                "path is active (the kernel manages its own residuals)",
                stacklevel=2,
            )
        from ..experimental.pallas.fused_mlp import nerf_apply_fused

        return nerf_apply_fused
    fn = nerf_apply
    if f8:
        if cfg.tpu.remat:
            warnings.warn(
                "TPUConfig.f8_residuals has no effect under tpu.remat: "
                "jax.checkpoint discards the stored residuals and "
                "recomputes the forward (you still pay the quantized-dW "
                "cast cost) — disable one of the two",
                stacklevel=2,
            )
        fn = partial(nerf_apply, f8_residuals=True)
    if cfg.tpu.remat:
        fn = jax.checkpoint(fn, static_argnums=(3, 4))
    return fn


def _render_loss(models, batch, key, cfg: NeRFConfig, apply_fn,
                 anneal_alpha=None):
    """MSE(coarse) + MSE(fine) and per-step metrics
    (reference: train.py:68-113)."""
    out = render_rays(
        models,
        batch["rays_o"],
        batch["rays_d"],
        key,
        cfg.render,
        cfg.model,
        is_train=True,
        compute_dtype=jnp.dtype(cfg.tpu.compute_dtype),
        apply_fn=apply_fn,
        anneal_alpha=anneal_alpha,
        fused_resample=resolve_fused_resample(cfg.tpu.fused_resample),
    )
    target = batch["target_rgb"]
    mse_c = jnp.mean((out["rgb_coarse"] - target) ** 2)
    loss = mse_c
    metrics = {"loss_coarse": mse_c, "psnr_coarse": psnr_from_mse(mse_c)}
    if "rgb_fine" in out:
        mse_f = jnp.mean((out["rgb_fine"] - target) ** 2)
        loss = loss + mse_f
        metrics["loss_fine"] = mse_f
        metrics["psnr_fine"] = psnr_from_mse(mse_f)
        metrics["psnr"] = metrics["psnr_fine"]
    else:
        metrics["loss_fine"] = jnp.zeros(())
        metrics["psnr"] = metrics["psnr_coarse"]
    metrics["loss"] = loss
    return loss, metrics


def _microbatch_count(cfg: NeRFConfig) -> int:
    """How many microbatches one batch splits into (1 = accumulation off).

    -1 = auto: 256 rays on accelerators (the measured v5e per-ray sweet
    spot, DESIGN.md microbatch sweep), off on CPU. Active only when
    0 < microbatch < batch and it divides the batch — anything else
    silently runs the single fused step (the knob is a pure
    performance/memory schedule; semantics are identical either way)."""
    mb = int(getattr(cfg.tpu, "microbatch", 0) or 0)
    if mb == -1:
        mb = 256 if jax.devices()[0].platform != "cpu" else 0
    b = cfg.data.batch_size
    if 0 < mb < b and b % mb == 0:
        return b // mb
    return 1


def _microbatched_grads(grad_fn, batch, key, n_micro: int, mesh):
    """Run `grad_fn(microbatch, key) -> ((loss, metrics), grads)` over
    `n_micro` equal slices of `batch` and average everything.

    One optimizer update per FULL batch, exactly like the fused step:
    per-ray losses are means over equal-size microbatches, so the mean of
    the microbatch grads IS the full-batch grad (up to float summation
    order). Activation memory drops from O(batch) to O(microbatch) — the
    schedule that makes million-ray batches fit HBM — and each microbatch
    runs at the small-batch per-ray sweet spot (DESIGN.md batch sweep).
    """
    mbatches = jax.tree_util.tree_map(
        lambda x: x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:]),
        batch,
    )
    keys = jax.random.split(key, n_micro)

    def body(carry, xs):
        mbatch, k = xs
        mbatch = constrain_batch(mbatch, mesh)
        out, grads = grad_fn(mbatch, k)
        # Accumulate in the carry — stacking n_micro grad trees as scan
        # outputs would materialize n_micro x |params| (39 GB at a
        # million-ray batch); the running sum keeps memory at O(|params|).
        acc_m, acc_g = carry
        acc_m = jax.tree_util.tree_map(jnp.add, acc_m, out[1])
        acc_g = jax.tree_util.tree_map(jnp.add, acc_g, grads)
        return (acc_m, acc_g), None

    zero_m, zero_g = jax.eval_shape(
        lambda: grad_fn(
            jax.tree_util.tree_map(lambda x: x[0], mbatches), keys[0]
        )
    )
    init = (
        jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                               zero_m[1]),
        jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), zero_g),
    )
    # ROBUST_NERF_MB_UNROLL > 1 unrolls the accumulation scan so XLA can
    # overlap adjacent microbatches' VPU and MXU work at k-times the
    # activation footprint (A/B knob; measured a clear LOSS on v5e —
    # 139.1k/111.7k/103.8k rays/s at unroll 1/2/4, DESIGN.md — the
    # unrolled body leaves the VMEM-scale working set that makes the
    # 256-ray microbatch fast; ships default 1).
    unroll = int(os.environ.get("ROBUST_NERF_MB_UNROLL", "1"))
    (metrics, grads), _ = jax.lax.scan(
        body, init, (mbatches, keys), unroll=max(1, min(unroll, n_micro))
    )
    inv = 1.0 / n_micro
    metrics = jax.tree_util.tree_map(lambda x: x * inv, metrics)
    grads = jax.tree_util.tree_map(lambda x: x * inv, grads)
    return _fix_mb_psnr(metrics), grads


def _fix_mb_psnr(metrics):
    """PSNR is -10*log10(mse): recompute from the AVERAGED mse so the logged
    value is the batch PSNR (mean of per-microbatch PSNRs would be the
    wrong statistic)."""
    metrics["psnr_coarse"] = psnr_from_mse(metrics["loss_coarse"])
    if "psnr_fine" in metrics:
        metrics["psnr_fine"] = psnr_from_mse(metrics["loss_fine"])
        metrics["psnr"] = metrics["psnr_fine"]
    else:
        metrics["psnr"] = metrics["psnr_coarse"]
    return metrics


def _microbatched_grads_stream(grad_fn, batch, key, n_micro: int, mesh):
    """Variant of `_microbatched_grads` for grad_fns that also produce
    cotangents of their PER-RAY inputs: grad_fn(microbatch, key) ->
    ((loss, metrics), (acc_grads, stream_grads)).

    `acc_grads` (parameter gradients — shared across microbatches)
    accumulate in the scan carry exactly as in `_microbatched_grads`;
    `stream_grads` are cotangents of the microbatch's own input slice —
    each belongs to DIFFERENT rays, so summing would be wrong — and are
    emitted as scan outputs, then re-flattened to full-batch arrays. Both
    carry the same 1/n_micro factor: the total loss is the mean of
    per-microbatch means, so every cotangent scales identically."""
    mbatches = jax.tree_util.tree_map(
        lambda x: x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:]),
        batch,
    )
    keys = jax.random.split(key, n_micro)

    def body(carry, xs):
        mbatch, k = xs
        mbatch = constrain_batch(mbatch, mesh)
        out, (acc_grads, stream_grads) = grad_fn(mbatch, k)
        acc_m, acc_g = carry
        acc_m = jax.tree_util.tree_map(jnp.add, acc_m, out[1])
        acc_g = jax.tree_util.tree_map(jnp.add, acc_g, acc_grads)
        return (acc_m, acc_g), stream_grads

    zero_out, (zero_acc, _) = jax.eval_shape(
        lambda: grad_fn(
            jax.tree_util.tree_map(lambda x: x[0], mbatches), keys[0]
        )
    )
    init = (
        jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                               zero_out[1]),
        jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                               zero_acc),
    )
    unroll = int(os.environ.get("ROBUST_NERF_MB_UNROLL", "1"))
    (metrics, grads), stream = jax.lax.scan(
        body, init, (mbatches, keys), unroll=max(1, min(unroll, n_micro))
    )
    inv = 1.0 / n_micro
    metrics = jax.tree_util.tree_map(lambda x: x * inv, metrics)
    grads = jax.tree_util.tree_map(lambda x: x * inv, grads)
    stream = jax.tree_util.tree_map(
        lambda x: (x * inv).reshape((-1,) + x.shape[2:]), stream
    )
    return _fix_mb_psnr(metrics), grads, stream


def make_train_chunk(cfg: NeRFConfig, mesh=None, steps: Optional[int] = None):
    """Build the jitted scanned-step function for standard training.

    Returns f(state, bank, base_key) -> (state, stacked per-iter metrics).
    `steps` defaults to cfg.tpu.steps_per_scan.
    """
    n_steps = steps or cfg.tpu.steps_per_scan
    optimizer = make_optimizer(cfg)
    schedule = make_lr_schedule(cfg.train.lr, cfg.train.lr_decay)
    batch_size = cfg.data.batch_size
    apply_fn = _apply_fn_for(cfg)
    n_micro = _microbatch_count(cfg)
    sharded_sampler = (
        make_sharded_ray_sampler(mesh, batch_size)
        if _bank_is_sharded(cfg, mesh)
        else None
    )

    def one_step(state: TrainState, bank: RayBank, base_key):
        key = jax.random.fold_in(base_key, state.step)
        k_batch, k_render = jax.random.split(key)
        if sharded_sampler is not None:
            batch = sharded_sampler(bank, k_batch)
        else:
            batch = sample_ray_batch(bank, k_batch, batch_size)
        batch = constrain_batch(batch, mesh)

        if n_micro > 1:
            metrics, grads = _microbatched_grads(
                lambda mb, k: jax.value_and_grad(
                    lambda m: _render_loss(m, mb, k, cfg, apply_fn),
                    has_aux=True,
                )(state.models),
                batch, k_render, n_micro, mesh,
            )
        else:
            (_, metrics), grads = jax.value_and_grad(
                lambda m: _render_loss(m, batch, k_render, cfg, apply_fn),
                has_aux=True,
            )(state.models)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.models)
        models = optax.apply_updates(state.models, updates)
        metrics["learning_rate"] = schedule(state.step)
        return TrainState(models, opt_state, state.step + 1), metrics

    @partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state: TrainState, bank: RayBank, base_key):
        def body(carry, _):
            new_state, metrics = one_step(carry, bank, base_key)
            return new_state, metrics

        return jax.lax.scan(body, state, None, length=n_steps)

    return train_chunk


def _regen_rays(pose_params, initial_poses, directions, image_indices,
                us, vs):
    """Current poses -> per-ray origins/directions, differentiable w.r.t.
    the SE(3) deltas — the pose-opt ray-regeneration chain."""
    poses = apply_pose_deltas(
        initial_poses,
        pose_params["rotation_deltas"],
        pose_params["translation_deltas"],
    )
    if os.environ.get("ROBUST_NERF_ONEHOT_POSES", "0") == "1":
        # A/B knob: select per-ray poses via a one-hot matmul instead of a
        # gather. The gather's BACKWARD is a (B,4,4)->(N,4,4) scatter-add;
        # the matmul form routes both directions through the MXU
        # (onehot.T @ dL/dbatch_poses). Measured on v5e: a wash (DESIGN.md),
        # ships default-off.
        onehot = jax.nn.one_hot(image_indices, poses.shape[0],
                                dtype=poses.dtype)
        batch_poses = jnp.einsum(
            "bn,nij->bij", onehot, poses, precision="highest"
        )
    else:
        batch_poses = poses[image_indices]               # (B, 4, 4) gather
    return get_rays_for_pixels(directions, batch_poses, us, vs)


def _pose_reg(pose_params, po, rot_reg_on, trans_reg_on):
    """Gated L2 pose-delta regularization (MEAN of squared deltas), exactly
    the reference's term (train_pose_opt.py:377-390)."""
    rotation_reg = jnp.mean(pose_params["rotation_deltas"] ** 2)
    translation_reg = jnp.mean(pose_params["translation_deltas"] ** 2)
    reg = (
        jnp.where(rot_reg_on, po.rotation_reg_weight * rotation_reg, 0.0)
        + jnp.where(trans_reg_on, po.translation_reg_weight * translation_reg,
                    0.0)
    )
    return reg, rotation_reg, translation_reg


def _pose_render_loss(models, pose_params, batch, initial_poses, key,
                      cfg: NeRFConfig, apply_fn, anneal_alpha=None,
                      rot_reg_on=True, trans_reg_on=True):
    """Joint loss: photometric + L2 pose-delta regularization, with rays
    regenerated differentiably from current pose estimates
    (reference: train_pose_opt.py:290-390).

    Regularization uses the MEAN of squared deltas and is gated on the
    pose-opt delay + per-component learn flags + weight>0, exactly like the
    reference (train_pose_opt.py:377-390). rot_reg_on/trans_reg_on are
    traced booleans carrying that gate."""
    rays_o, rays_d = _regen_rays(
        pose_params, initial_poses, batch["directions"],
        batch["image_indices"], batch["us"], batch["vs"],
    )
    rbatch = {
        "rays_o": rays_o,
        "rays_d": rays_d,
        "target_rgb": batch["target_rgb"],
    }
    loss, metrics = _render_loss(models, rbatch, key, cfg, apply_fn,
                                 anneal_alpha=anneal_alpha)
    reg, rotation_reg, translation_reg = _pose_reg(
        pose_params, cfg.pose_opt, rot_reg_on, trans_reg_on
    )
    metrics["rotation_reg"] = rotation_reg
    metrics["translation_reg"] = translation_reg
    metrics["pose_reg_loss"] = reg
    total = loss + reg
    metrics["loss"] = total
    return total, metrics


# Measured on v5e (round 4): hashgrid train/pose-opt chunks under the XOR
# hash crash the TPU worker process ("kernel fault") when a long lax.scan
# wraps the gather/scatter-heavy step — deterministic at steps_per_scan=250
# with 64+64 samples on the pose-opt chunk and at ~100-200 steps with
# 64+128 on the STANDARD chunk (scripts/bench_hashgrid.py), clean at <=50
# in both; the MLP family is clean at any length. Round 5: the fault is a
# property of the XOR scheme's 8-narrow-gathers/8-narrow-scatters per
# level — the "packed" scheme (one wide gather/scatter per level,
# models/hashgrid.py) runs BOTH chunks clean at steps_per_scan=250 on the
# same chip, so the cap now applies only to hash_impl="xor".
HASHGRID_MAX_SCAN_TPU = 50


def hashgrid_scan_cap(cfg: NeRFConfig) -> int:
    """steps_per_scan that is safe for this model family on this backend."""
    if (
        getattr(cfg.model, "architecture", "mlp") == "hashgrid"
        and getattr(cfg.model, "hash_impl", "packed") == "xor"
        and jax.default_backend() == "tpu"
        and cfg.tpu.steps_per_scan > HASHGRID_MAX_SCAN_TPU
    ):
        warnings.warn(
            f"hashgrid (hash_impl=xor) on TPU: capping steps_per_scan "
            f"{cfg.tpu.steps_per_scan} -> {HASHGRID_MAX_SCAN_TPU} "
            "(longer scans of the 8-narrow-gather step crash the TPU "
            "worker; hash_impl='packed' has no cap — see "
            "training/steps.py HASHGRID_MAX_SCAN_TPU)",
            stacklevel=2,
        )
        return HASHGRID_MAX_SCAN_TPU
    return cfg.tpu.steps_per_scan


# Backward-compat name used by round-4 call sites before the standard
# train chunk was found to need the same cap.
pose_opt_scan_cap = hashgrid_scan_cap


def make_pose_opt_chunk(cfg: NeRFConfig, mesh=None, steps: Optional[int] = None):
    """Jitted scanned-step function for joint NeRF + pose optimization.

    Pose gradients are gated (zeroed) before cfg.pose_opt.pose_opt_delay and
    masked by learn_rotation/learn_translation — with Adam moments starting
    at zero, zero grads give exactly zero updates, reproducing the
    reference's staged-optimization behavior (train_pose_opt.py:859, :407-409)
    without any control flow in the compiled program.
    """
    n_steps = steps or cfg.tpu.steps_per_scan
    # Per-model clip for the pose-opt path: reference clips coarse and fine
    # separately at max_norm 1.0 each (train_pose_opt.py:398-401).
    # ROBUST_NERF_COMBINED_CLIP=1 restores the combined-norm variant (A/B).
    import os as _os

    _per_model = _os.environ.get("ROBUST_NERF_COMBINED_CLIP", "0") != "1"
    # Default-on perf schedule for the microbatched path: regenerate rays
    # once per step outside the scan (see the hoist branch below);
    # ROBUST_NERF_HOIST_POSE_RAYS=0 restores the per-microbatch regen (A/B).
    _hoist_rays = _os.environ.get("ROBUST_NERF_HOIST_POSE_RAYS", "1") != "0"
    optimizer = make_optimizer(cfg, per_model_clip=_per_model)
    pose_optimizer = make_pose_optimizer(cfg)
    schedule = make_lr_schedule(cfg.train.lr, cfg.train.lr_decay)
    batch_size = cfg.data.batch_size
    po = cfg.pose_opt
    apply_fn = _apply_fn_for(cfg)
    n_micro = _microbatch_count(cfg)
    sharded_sampler = (
        make_sharded_pixel_sampler(mesh, batch_size)
        if _bank_is_sharded(cfg, mesh)
        else None
    )

    def one_step(state: PoseOptState, bank: PixelBank, base_key):
        key = jax.random.fold_in(base_key, state.step)
        k_batch, k_render = jax.random.split(key)
        if sharded_sampler is not None:
            batch = sharded_sampler(bank, k_batch)
        else:
            batch = sample_pixel_batch(bank, k_batch, batch_size)
        batch = constrain_batch(batch, mesh)
        batch["directions"] = bank.directions   # (H, W, 3), replicated

        # BARF coarse-to-fine frequency annealing: alpha ramps 0 -> L over
        # freq_anneal_iters steps (0 = disabled = reference behavior).
        if po.freq_anneal_iters > 0:
            anneal_alpha = cfg.model.pos_freqs * jnp.clip(
                state.step.astype(jnp.float32) / po.freq_anneal_iters, 0.0, 1.0
            )
        else:
            anneal_alpha = None

        # Staged gate + per-component freezing, computed up front so the
        # loss can gate the regularization term the same way the reference
        # gates it on `optimize_poses` (train_pose_opt.py:378-386).
        gate = state.step >= po.pose_opt_delay
        rot_on = jnp.logical_and(gate, po.learn_rotation)
        trans_on = jnp.logical_and(gate, po.learn_translation)
        rot_reg_on = jnp.logical_and(rot_on, po.rotation_reg_weight > 0)
        trans_reg_on = jnp.logical_and(trans_on, po.translation_reg_weight > 0)

        if n_micro > 1 and _hoist_rays:
            # Hoist the pose->ray chain OUT of the microbatch scan: poses
            # are constant within a step, so full-batch rays are computed
            # ONCE via jax.vjp, the scan interior becomes the standard
            # (fixed-ray) render step emitting per-ray cotangents, and pose
            # gradients come back through a single VJP pullback after the
            # scan. Exact (VJP is linear in the cotangent): the scan-summed
            # ray cotangents ARE dL/d(rays), so pulling them back once
            # equals pulling each microbatch back separately. The reg term
            # never touches the rays — its gradient is closed-form
            # (d/dp w*mean(p^2) = 2w p / numel) and added outside.
            (rays_o, rays_d), regen_vjp = jax.vjp(
                lambda p: _regen_rays(
                    p, state.initial_poses, bank.directions,
                    batch["image_indices"], batch["us"], batch["vs"],
                ),
                state.pose_params,
            )
            per_ray = {
                "rays_o": rays_o,
                "rays_d": rays_d,
                "target_rgb": batch["target_rgb"],
            }

            def grad_fn(mb, k):
                def loss_fn(m, ro, rd):
                    rb = {"rays_o": ro, "rays_d": rd,
                          "target_rgb": mb["target_rgb"]}
                    return _render_loss(m, rb, k, cfg, apply_fn,
                                        anneal_alpha=anneal_alpha)

                (loss, mets), (gm, gro, grd) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1, 2), has_aux=True
                )(state.models, mb["rays_o"], mb["rays_d"])
                return (loss, mets), (gm, {"rays_o": gro, "rays_d": grd})

            metrics, grads, ray_cts = _microbatched_grads_stream(
                grad_fn, per_ray, k_render, n_micro, mesh
            )
            (pose_grads,) = regen_vjp(
                (ray_cts["rays_o"], ray_cts["rays_d"])
            )
            reg, rotation_reg, translation_reg = _pose_reg(
                state.pose_params, po, rot_reg_on, trans_reg_on
            )
            metrics["rotation_reg"] = rotation_reg
            metrics["translation_reg"] = translation_reg
            metrics["pose_reg_loss"] = reg
            metrics["loss"] = metrics["loss"] + reg
            pose_grads = {
                "rotation_deltas": pose_grads["rotation_deltas"]
                + jnp.where(
                    rot_reg_on,
                    2.0 * po.rotation_reg_weight
                    / state.pose_params["rotation_deltas"].size,
                    0.0,
                ) * state.pose_params["rotation_deltas"],
                "translation_deltas": pose_grads["translation_deltas"]
                + jnp.where(
                    trans_reg_on,
                    2.0 * po.translation_reg_weight
                    / state.pose_params["translation_deltas"].size,
                    0.0,
                ) * state.pose_params["translation_deltas"],
            }
        elif n_micro > 1:
            # `directions` is the shared (H, W, 3) grid, not per-ray — keep
            # it out of the microbatch split and re-attach per slice.
            per_ray = {k: v for k, v in batch.items() if k != "directions"}

            def grad_fn(mb, k):
                mb = dict(mb)
                mb["directions"] = bank.directions
                return jax.value_and_grad(
                    lambda m, p: _pose_render_loss(
                        m, p, mb, state.initial_poses, k, cfg, apply_fn,
                        anneal_alpha, rot_reg_on, trans_reg_on,
                    ),
                    argnums=(0, 1),
                    has_aux=True,
                )(state.models, state.pose_params)

            metrics, (grads, pose_grads) = _microbatched_grads(
                grad_fn, per_ray, k_render, n_micro, mesh
            )
        else:
            (_, metrics), (grads, pose_grads) = jax.value_and_grad(
                lambda m, p: _pose_render_loss(
                    m, p, batch, state.initial_poses, k_render, cfg, apply_fn,
                    anneal_alpha, rot_reg_on, trans_reg_on,
                ),
                argnums=(0, 1),
                has_aux=True,
            )(state.models, state.pose_params)

        # `where`, not multiply: a gated-off NaN/inf grad must become
        # exactly zero.
        pose_grads = {
            "rotation_deltas": jnp.where(
                rot_on, pose_grads["rotation_deltas"], 0.0
            ),
            "translation_deltas": jnp.where(
                trans_on, pose_grads["translation_deltas"], 0.0
            ),
        }

        updates, opt_state = optimizer.update(grads, state.opt_state, state.models)
        models = optax.apply_updates(state.models, updates)
        pose_updates, new_pose_opt_state = pose_optimizer.update(
            pose_grads, state.pose_opt_state, state.pose_params
        )
        # Freeze the WHOLE pose optimizer pre-gate, including Adam's step
        # count: the reference never steps optimizer_poses during the delay
        # (train_pose_opt.py:407-409), so its bias correction is fresh when
        # pose optimization switches on. Stepping with zero grads would
        # advance `count` to ~delay and make the first real updates
        # ~1/sqrt(1-beta2^t) ~ 2.5x larger than the reference's.
        pose_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(gate, new, old),
            new_pose_opt_state, state.pose_opt_state,
        )
        pose_params = optax.apply_updates(state.pose_params, pose_updates)

        if po.gauge_anchor:
            # Gauge re-anchoring (core/se3.project_gauge_deltas): fold the
            # best-fit similarity current->initial centers back into the
            # deltas so the constellation cannot drift off the init gauge.
            # Centers only move when translations are learned, so the
            # projection is active iff trans_on; the rotation part of the
            # gauge is fit only when rotations are learnable.
            proj = project_gauge_deltas(
                state.initial_poses,
                pose_params["rotation_deltas"],
                pose_params["translation_deltas"],
                fit_rotation=bool(po.learn_rotation),
            )
            pose_params = jax.tree_util.tree_map(
                lambda p, q: jnp.where(trans_on, q, p), pose_params, proj
            )

        metrics["learning_rate"] = schedule(state.step)
        metrics["pose_opt_active"] = gate.astype(jnp.float32)
        new_state = PoseOptState(
            models, pose_params, state.initial_poses,
            opt_state, pose_opt_state, state.step + 1,
        )
        return new_state, metrics

    @partial(jax.jit, donate_argnums=(0,))
    def pose_opt_chunk(state: PoseOptState, bank: PixelBank, base_key):
        def body(carry, _):
            new_state, metrics = one_step(carry, bank, base_key)
            return new_state, metrics

        return jax.lax.scan(body, state, None, length=n_steps)

    return pose_opt_chunk


def current_poses(state: PoseOptState) -> jnp.ndarray:
    """Current pose estimates = exp-map deltas composed onto init poses
    (reference: CameraPoseParameters.get_poses, train_pose_opt.py:186-226)."""
    return apply_pose_deltas(
        state.initial_poses,
        state.pose_params["rotation_deltas"],
        state.pose_params["translation_deltas"],
    )
