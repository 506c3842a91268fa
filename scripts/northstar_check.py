"""North-star check: joint pose optimization recovers severely-noised poses.

BASELINE.json target: from 5 deg rotation + 5% translation noise, joint
optimization recovers camera poses to <0.5 deg / <1%-of-distance at
reference-level PSNR. The Blender set is not on disk, so the check runs on
the procedural analytic scene (same camera rig geometry: ring at radius 4,
near 2 / far 6) — the pose-recovery mechanism under test is identical.

Prints one JSON line with initial/final pose errors, PSNR, wall time, and
pass/fail against the target thresholds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import robust_nerf_tpu as rn  # noqa: E402
from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_poses  # noqa: E402
from robust_nerf_tpu.core.se3 import align_poses_umeyama, pose_errors  # noqa: E402
from robust_nerf_tpu.data.banks import build_pixel_bank  # noqa: E402
from robust_nerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from robust_nerf_tpu.evalx.metrics import compute_psnr  # noqa: E402
from robust_nerf_tpu.ops.rendering import render_image  # noqa: E402
from robust_nerf_tpu.training.steps import (  # noqa: E402
    create_pose_opt_state,
    current_poses,
    make_pose_opt_chunk,
)


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--num_images", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--rotation_noise", type=float, default=5.0)
    p.add_argument("--translation_noise_pct", type=float, default=5.0)
    p.add_argument("--pose_lr", type=float, default=5e-4)
    p.add_argument("--pose_opt_delay", type=int, default=500)
    p.add_argument("--freq_anneal_iters", type=int, default=2000)
    p.add_argument("--num_samples", type=int, default=64)
    p.add_argument("--num_samples_fine", type=int, default=64)
    # model-size knobs: production defaults; shrink on CPU meshes where
    # the 8x256 MLPs dominate (the sharded-path semantics under test —
    # shard_map sampling, psum'd pose+MLP grads — are size-independent)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--num_hidden_layers", type=int, default=8)
    p.add_argument("--pos_freqs", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    # reference-default regularization (train_pose_opt.py:621); the reg is
    # a MEAN over deltas gated on the delay, so the defaults are mild
    p.add_argument("--rotation_reg_weight", type=float, default=0.01)
    p.add_argument("--translation_reg_weight", type=float, default=0.001)
    p.add_argument("--shard_bank", action="store_true",
                   help="split the pixel bank across the mesh (1/D HBM per "
                        "device) with per-device local sampling")
    p.add_argument("--num_devices", type=int, default=0,
                   help="data-parallel mesh size (0 = all visible devices; "
                        "pose grads psum across shards)")
    p.add_argument("--steps_per_scan", type=int, default=250,
                   help="use small values on CPU meshes (compile time)")
    p.add_argument("--use_pallas", type=str, default="auto",
                   choices=["auto", "on", "off"])
    args = p.parse_args(argv)

    cfg = rn.NeRFConfig()
    cfg.data.batch_size = args.batch_size
    cfg.model = rn.ModelConfig(
        hidden_dim=args.hidden_dim,
        num_hidden_layers=args.num_hidden_layers,
        pos_freqs=args.pos_freqs,
        skips=(args.num_hidden_layers // 2,),
    )
    cfg.render = rn.RenderConfig(
        num_samples=args.num_samples, num_samples_fine=args.num_samples_fine
    )
    cfg.tpu = rn.TPUConfig(steps_per_scan=args.steps_per_scan,
                           compute_dtype="bfloat16",
                           use_pallas=args.use_pallas)
    cfg.pose_opt = rn.PoseOptConfig(
        pose_opt_delay=args.pose_opt_delay,
        pose_lr=args.pose_lr,
        rotation_reg_weight=args.rotation_reg_weight,
        translation_reg_weight=args.translation_reg_weight,
        freq_anneal_iters=args.freq_anneal_iters,
    )

    scene = make_synthetic_scene(
        num_images=args.num_images, resolution=args.resolution,
        num_samples=256, textured=True,
    )
    val = make_synthetic_scene(num_images=3, resolution=args.resolution,
                               split="val", num_samples=256, textured=True)
    gt = np.asarray(scene.poses)
    noisy, _ = add_noise_to_poses(
        gt,
        NoiseConfig(
            rotation_noise_deg=args.rotation_noise,
            translation_noise_pct=args.translation_noise_pct,
            seed=args.seed + 100,
        ),
    )
    mean_cam_dist = float(np.mean(np.linalg.norm(gt[:, :3, 3], axis=-1)))

    from robust_nerf_tpu.parallel.mesh import create_mesh, replicate

    cfg.tpu = rn.TPUConfig(
        steps_per_scan=cfg.tpu.steps_per_scan,
        compute_dtype=cfg.tpu.compute_dtype,
        num_devices=args.num_devices,
        shard_bank=args.shard_bank,
    )
    mesh = create_mesh(args.num_devices)
    bank = build_pixel_bank(scene)
    if args.shard_bank and int(np.prod(mesh.devices.shape)) > 1:
        from robust_nerf_tpu.data.banks import shard_bank

        bank = shard_bank(bank, mesh)
    else:
        bank = replicate(bank, mesh)
    state = create_pose_opt_state(jax.random.PRNGKey(args.seed), cfg, jnp.asarray(noisy))
    state = replicate(state, mesh)
    errs0 = jax.device_get(pose_errors(current_poses(state), jnp.asarray(gt)))
    chunk = make_pose_opt_chunk(cfg, mesh=mesh, steps=cfg.tpu.steps_per_scan)

    t0 = time.time()
    i = 0
    while i < args.iters:
        state, m = chunk(state, bank, jax.random.PRNGKey(args.seed + 1))
        i += cfg.tpu.steps_per_scan
        errs = jax.device_get(pose_errors(current_poses(state), jnp.asarray(gt)))
        print(
            f"iter {i:6d} loss {float(m['loss'][-1]):.5f} "
            f"rot_err {float(errs['mean_rotation_error_deg']):.4f} deg "
            f"trans_err {float(errs['mean_translation_error']):.5f}",
            file=sys.stderr,
        )
    wall = time.time() - t0

    final = np.asarray(jax.device_get(current_poses(state)))
    errs = jax.device_get(pose_errors(jnp.asarray(final), jnp.asarray(gt)))
    # gauge-aligned errors: the photometric loss is invariant to a global
    # SIM(3), so the recoverable quantity is the RELATIVE pose configuration
    aligned, _xform = align_poses_umeyama(final, gt)
    errs_al = jax.device_get(pose_errors(jnp.asarray(aligned), jnp.asarray(gt)))
    psnrs = []
    for k in range(val.images.shape[0]):
        out = render_image(
            state.models, val.poses[k], val.H, val.W, val.focal,
            cfg.render, cfg.model, cfg.tpu,
        )
        psnrs.append(float(compute_psnr(jnp.asarray(out["rgb"]), val.images[k])))

    rot_final = float(errs_al["mean_rotation_error_deg"])
    trans_final = float(errs_al["mean_translation_error"])
    trans_pct = 100.0 * trans_final / mean_cam_dist
    rot_raw = float(errs["mean_rotation_error_deg"])
    trans_raw = float(errs["mean_translation_error"])
    trans_pct_raw = 100.0 * trans_raw / mean_cam_dist
    result = {
        "initial_rotation_error_deg": float(errs0["mean_rotation_error_deg"]),
        "initial_translation_error": float(errs0["mean_translation_error"]),
        "final_rotation_error_deg_raw": rot_raw,
        "final_translation_error_raw": trans_raw,
        "final_translation_error_pct_of_distance_raw": trans_pct_raw,
        "final_rotation_error_deg_aligned": rot_final,
        "final_translation_error_aligned": trans_final,
        "final_translation_error_pct_of_distance": trans_pct,
        "val_psnr": float(np.mean(psnrs)),
        "iters": args.iters,
        "wall_time_s": round(wall, 1),
        "num_devices": int(np.prod(mesh.devices.shape)),
        "shard_bank": bool(args.shard_bank),
        "backend": jax.default_backend(),
        # BOTH flags reported: raw errors are the reference's own
        # definition (train_pose_opt.py:232-271, direct per-pose compare);
        # aligned errors first remove the global SIM(3) gauge the
        # photometric loss cannot observe (core/se3.align_poses_umeyama,
        # standard practice per BARF). The headline target keys on the
        # aligned numbers; target_met_raw records the stricter raw check.
        "target_met": bool(rot_final < 0.5 and trans_pct < 1.0),
        "target_met_raw": bool(rot_raw < 0.5 and trans_pct_raw < 1.0),
        "gauge_note": (
            "raw = direct per-pose errors vs GT (reference definition); "
            "aligned = after closed-form SIM(3) Umeyama alignment of "
            "camera centers (joint pose+scene opt only determines poses "
            "up to a global similarity gauge)"
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
