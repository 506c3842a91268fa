"""North-star check: joint pose optimization recovers severely-noised poses.

BASELINE.json target: from 5 deg rotation + 5% translation noise, joint
optimization recovers camera poses to <0.5 deg / <1%-of-distance at
reference-level PSNR. The Blender set is not on disk, so the check runs on
the procedural analytic scene (same camera rig geometry: ring at radius 4,
near 2 / far 6) — the pose-recovery mechanism under test is identical.

Round 4 (VERDICT r3 #1): gauge anchoring (core/se3.project_gauge_deltas)
keeps the constellation pinned to the initial gauge during optimization, so
RAW pose errors (the reference's own definition, direct per-pose compare
vs GT with no alignment — noisy_src/train_pose_opt.py:232-271) converge to
the information-theoretic floor: the Karcher mean of the injected noise,
O(sigma/sqrt(N)). That floor is reported (`raw_floor_*`) so the raw result
can be judged against what is achievable at all. Validation PSNR is
reported under BOTH protocols: `val_psnr_raw_protocol` renders GT val
poses directly (reference protocol), `val_psnr_gauge_corrected` first maps
the val cameras into the scene's estimated gauge via the fitted inverse
SIM(3) (experiment-mode; sanctioned fix per VERDICT r3 #1). `--control`
additionally runs a clean-init pose-opt control at the SAME config in the
same invocation so the "at reference PSNR" clause is checked in one
artifact: target_met_full = target_met_raw AND gauge-corrected val PSNR
within 2 dB of the control.

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
from robust_nerf_tpu.core.se3 import (  # noqa: E402
    align_poses_umeyama,
    apply_sim3_inverse_to_poses,
    pose_errors,
)
from robust_nerf_tpu.data.banks import build_pixel_bank  # noqa: E402
from robust_nerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from robust_nerf_tpu.evalx.metrics import compute_psnr  # noqa: E402
from robust_nerf_tpu.ops.rendering import render_image  # noqa: E402
from robust_nerf_tpu.training.steps import (  # noqa: E402
    create_pose_opt_state,
    current_poses,
    make_pose_opt_chunk,
    pose_opt_scan_cap,
)


def _val_psnr(state, val, cfg, poses) -> float:
    psnrs = []
    for k in range(val.images.shape[0]):
        out = render_image(
            state.models, poses[k], val.H, val.W, val.focal,
            cfg.render, cfg.model, cfg.tpu,
        )
        psnrs.append(float(compute_psnr(jnp.asarray(out["rgb"]), val.images[k])))
    return float(np.mean(psnrs))


def _run_pose_opt(cfg, scene, init_poses, gt, seed, iters, tag=""):
    """Train; returns (state, final_poses, wall_s)."""
    from robust_nerf_tpu.parallel.mesh import create_mesh, replicate

    mesh = create_mesh(cfg.tpu.num_devices)
    bank = build_pixel_bank(scene)
    if cfg.tpu.shard_bank and int(np.prod(mesh.devices.shape)) > 1:
        from robust_nerf_tpu.data.banks import shard_bank

        bank = shard_bank(bank, mesh)
    else:
        bank = replicate(bank, mesh)
    state = create_pose_opt_state(
        jax.random.PRNGKey(seed), cfg, jnp.asarray(init_poses)
    )
    state = replicate(state, mesh)
    n_scan = pose_opt_scan_cap(cfg)
    chunk = make_pose_opt_chunk(cfg, mesh=mesh, steps=n_scan)
    t0 = time.time()
    i = 0
    while i < iters:
        state, m = chunk(state, bank, jax.random.PRNGKey(seed + 1))
        i += n_scan
        errs = jax.device_get(
            pose_errors(current_poses(state), jnp.asarray(gt))
        )
        print(
            f"{tag}iter {i:6d} loss {float(m['loss'][-1]):.5f} "
            f"rot_err {float(errs['mean_rotation_error_deg']):.4f} deg "
            f"trans_err {float(errs['mean_translation_error']):.5f}",
            file=sys.stderr,
        )
    wall = time.time() - t0
    final = np.asarray(jax.device_get(current_poses(state)))
    return state, final, wall


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--num_images", type=int, default=100,
                   help="training cameras; the raw-error gauge floor is the "
                        "Karcher mean of the noise ~ sigma/sqrt(N) "
                        "(reference lego: 100 train images)")
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
    p.add_argument("--architecture", type=str, default="mlp",
                   choices=["mlp", "hashgrid"])
    p.add_argument("--lr", type=float, default=None,
                   help="model learning rate (default: 5e-4 for mlp, "
                        "1e-2 for hashgrid — scripts/bench_hashgrid.py)")
    p.add_argument("--seed", type=int, default=0)
    # reference-default regularization (train_pose_opt.py:621); the reg is
    # a MEAN over deltas gated on the delay, so the defaults are mild
    p.add_argument("--rotation_reg_weight", type=float, default=0.01)
    p.add_argument("--translation_reg_weight", type=float, default=0.001)
    p.add_argument("--gauge_anchor", dest="gauge_anchor",
                   action="store_true", default=True)
    p.add_argument("--no_gauge_anchor", dest="gauge_anchor",
                   action="store_false",
                   help="disable the per-step SIM(3) gauge projection")
    p.add_argument("--control", action="store_true",
                   help="also run a clean-init pose-opt control at the same "
                        "config and gate target_met_full on 'within 2 dB of "
                        "control'")
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
    p.add_argument("--val_pose_refine", action="store_true",
                   help="after training, register val cameras against the "
                        "frozen scene (test-time pose refinement, "
                        "evalx/pose_refine.py) and report "
                        "val_psnr_refined; applied symmetrically to the "
                        "--control run")
    p.add_argument("--val_refine_iters", type=int, default=600)
    p.add_argument("--out", type=str, default=None,
                   help="also write the JSON line to this path")
    args = p.parse_args(argv)

    cfg = rn.NeRFConfig()
    cfg.train.lr = (args.lr if args.lr is not None
                    else (1e-2 if args.architecture == "hashgrid" else 5e-4))
    cfg.train.seed = args.seed
    cfg.data.batch_size = args.batch_size
    cfg.model = rn.ModelConfig(
        hidden_dim=args.hidden_dim,
        num_hidden_layers=args.num_hidden_layers,
        pos_freqs=args.pos_freqs,
        skips=(args.num_hidden_layers // 2,),
        architecture=args.architecture,
    )
    cfg.render = rn.RenderConfig(
        num_samples=args.num_samples, num_samples_fine=args.num_samples_fine
    )
    cfg.tpu = rn.TPUConfig(
        steps_per_scan=args.steps_per_scan,
        compute_dtype="bfloat16",
        use_pallas=args.use_pallas,
        num_devices=args.num_devices,
        shard_bank=args.shard_bank,
    )
    cfg.pose_opt = rn.PoseOptConfig(
        pose_opt_delay=args.pose_opt_delay,
        pose_lr=args.pose_lr,
        rotation_reg_weight=args.rotation_reg_weight,
        translation_reg_weight=args.translation_reg_weight,
        freq_anneal_iters=args.freq_anneal_iters,
        gauge_anchor=args.gauge_anchor,
    )

    scene = make_synthetic_scene(
        num_images=args.num_images, resolution=args.resolution,
        num_samples=256, textured=True,
    )
    val = make_synthetic_scene(num_images=3, resolution=args.resolution,
                               split="val", num_samples=256, textured=True)
    gt = np.asarray(scene.poses)
    noisy, noise_info = add_noise_to_poses(
        gt,
        NoiseConfig(
            rotation_noise_deg=args.rotation_noise,
            translation_noise_pct=args.translation_noise_pct,
            seed=args.seed + 100,
        ),
    )
    mean_cam_dist = float(np.mean(np.linalg.norm(gt[:, :3, 3], axis=-1)))

    # Information-theoretic raw floor: the anchored dynamics converge to
    # the gauge of the INIT constellation (best-fit SIM(3) of the noisy
    # init poses vs GT = the collective/mean component of the injected
    # noise, which no optimizer can observe). A perfectly-recovered run
    # therefore lands at G*(GT) where G* is that gauge — compare it to GT
    # directly to get the per-camera raw-error floor.
    _, init_xform = align_poses_umeyama(noisy, gt)
    floor_poses = apply_sim3_inverse_to_poses(gt, init_xform)
    floor = jax.device_get(
        pose_errors(jnp.asarray(floor_poses), jnp.asarray(gt))
    )

    state, final, wall = _run_pose_opt(
        cfg, scene, noisy, gt, args.seed, args.iters
    )
    errs = jax.device_get(pose_errors(jnp.asarray(final), jnp.asarray(gt)))
    # gauge-aligned errors: the photometric loss is invariant to a global
    # SIM(3), so the recoverable quantity is the RELATIVE pose configuration
    aligned, xform = align_poses_umeyama(final, gt)
    errs_al = jax.device_get(pose_errors(jnp.asarray(aligned), jnp.asarray(gt)))

    val_psnr_raw = _val_psnr(state, val, cfg, val.poses)
    val_gauge_poses = apply_sim3_inverse_to_poses(np.asarray(val.poses), xform)
    val_psnr_corrected = _val_psnr(state, val, cfg, jnp.asarray(val_gauge_poses))

    def _refined_val_psnr(st, init_poses, tag):
        """Test-time val-pose refinement (evalx/pose_refine.py): register
        the val cameras against the FROZEN scene photometrically — the
        standard BARF-family protocol for evaluating a scene whose gauge
        (and residual per-camera wander) differs from the GT cameras. 6
        DOF/camera cannot fake texture against H*W pixels; applied
        SYMMETRICALLY to the recovered run and the control."""
        from robust_nerf_tpu.evalx.pose_refine import refine_poses

        models = jax.device_get(st.models)
        refined, info = refine_poses(
            models, cfg, np.asarray(init_poses), np.asarray(val.images),
            val.H, val.W, val.focal, iters=args.val_refine_iters,
            seed=args.seed,
        )
        psnr = _val_psnr(st, val, cfg, jnp.asarray(refined))
        print(f"{tag}val-pose refine: loss {info['first_loss']:.2e} -> "
              f"{info['final_loss']:.2e}, psnr {psnr:.2f}", file=sys.stderr)
        return psnr

    val_psnr_refined = None
    if args.val_pose_refine:
        # start from the gauge-corrected guesses: refinement is then a
        # pure local registration
        val_psnr_refined = _refined_val_psnr(state, val_gauge_poses, "")

    control_val_psnr = None
    control_rot_err = None
    control_wall = None
    control_val_psnr_refined = None
    if args.control:
        print("--- clean-init control run ---", file=sys.stderr)
        cstate, cfinal, control_wall = _run_pose_opt(
            cfg, scene, gt, gt, args.seed, args.iters, tag="[control] "
        )
        cerrs = jax.device_get(pose_errors(jnp.asarray(cfinal), jnp.asarray(gt)))
        control_rot_err = float(cerrs["mean_rotation_error_deg"])
        control_val_psnr = _val_psnr(cstate, val, cfg, val.poses)
        if args.val_pose_refine:
            control_val_psnr_refined = _refined_val_psnr(
                cstate, val.poses, "[control] "
            )

    # per-camera distribution of the aligned errors: a stuck tail (a few
    # cameras in bad local minima) shows up as p90/max >> median
    per_cam = np.asarray(errs_al["rotation_errors_deg"])
    dist = {
        "aligned_rot_median_deg": float(np.median(per_cam)),
        "aligned_rot_p90_deg": float(np.percentile(per_cam, 90)),
        "aligned_rot_max_deg": float(np.max(per_cam)),
    }

    rot_final = float(errs_al["mean_rotation_error_deg"])
    trans_final = float(errs_al["mean_translation_error"])
    trans_pct = 100.0 * trans_final / mean_cam_dist
    rot_raw = float(errs["mean_rotation_error_deg"])
    trans_raw = float(errs["mean_translation_error"])
    trans_pct_raw = 100.0 * trans_raw / mean_cam_dist
    target_met_raw = bool(rot_raw < 0.5 and trans_pct_raw < 1.0)
    result = {
        "initial_rotation_error_deg": float(jax.device_get(pose_errors(
            jnp.asarray(noisy), jnp.asarray(gt)))["mean_rotation_error_deg"]),
        "initial_translation_error": float(jax.device_get(pose_errors(
            jnp.asarray(noisy), jnp.asarray(gt)))["mean_translation_error"]),
        "num_images": args.num_images,
        "gauge_anchor": bool(args.gauge_anchor),
        "architecture": args.architecture,
        "final_rotation_error_deg_raw": rot_raw,
        "final_translation_error_raw": trans_raw,
        "final_translation_error_pct_of_distance_raw": trans_pct_raw,
        **dist,
        "final_rotation_error_deg_aligned": rot_final,
        "final_translation_error_aligned": trans_final,
        "final_translation_error_pct_of_distance": trans_pct,
        # achievable-raw floor: gauge component of the injected noise
        # (unobservable) — raw errors cannot beat ~this no matter what
        "raw_floor_rotation_error_deg": float(
            floor["mean_rotation_error_deg"]),
        "raw_floor_translation_error_pct": 100.0 * float(
            floor["mean_translation_error"]) / mean_cam_dist,
        "val_psnr_raw_protocol": val_psnr_raw,
        "val_psnr_gauge_corrected": val_psnr_corrected,
        "val_psnr_refined": val_psnr_refined,
        "control_val_psnr_refined": control_val_psnr_refined,
        "control_val_psnr": control_val_psnr,
        "control_rotation_error_deg": control_rot_err,
        "control_wall_time_s": (round(control_wall, 1)
                                if control_wall is not None else None),
        "iters": args.iters,
        # full recipe, so a headline number is always reproducible from
        # its artifact alone (round-5 lesson: the round-4 headline's
        # exact flags could not be reconstructed)
        "recipe": {
            "batch_size": args.batch_size,
            "resolution": args.resolution,
            "num_samples": args.num_samples,
            "num_samples_fine": args.num_samples_fine,
            "lr": cfg.train.lr,
            "pose_lr": args.pose_lr,
            "pose_opt_delay": args.pose_opt_delay,
            "freq_anneal_iters": args.freq_anneal_iters,
            "rotation_reg_weight": args.rotation_reg_weight,
            "translation_reg_weight": args.translation_reg_weight,
            "rotation_noise": args.rotation_noise,
            "translation_noise_pct": args.translation_noise_pct,
            "seed": args.seed,
            "steps_per_scan": args.steps_per_scan,
        },
        "wall_time_s": round(wall, 1),
        "num_devices": int(cfg.tpu.num_devices) or len(jax.devices()),
        "shard_bank": bool(args.shard_bank),
        "backend": jax.default_backend(),
        # BOTH flags reported: raw errors are the reference's own
        # definition (train_pose_opt.py:232-271, direct per-pose compare);
        # aligned errors first remove the global SIM(3) gauge the
        # photometric loss cannot observe (core/se3.align_poses_umeyama,
        # standard practice per BARF). target_met_raw is the strict
        # reference-definition check; target_met_full additionally gates
        # on validation PSNR within 2 dB of the clean-init control.
        "target_met": bool(rot_final < 0.5 and trans_pct < 1.0),
        "target_met_raw": target_met_raw,
        "target_met_full": (
            bool(target_met_raw
                 and control_val_psnr - val_psnr_corrected <= 2.0)
            if control_val_psnr is not None else None
        ),
        # same criterion under the symmetric test-time val-pose-refinement
        # protocol (both runs' val cameras registered against their own
        # frozen scenes) — removes the val-camera-error term that the
        # wander sweep (results/northstar_r5/wander_sweep.json) shows
        # dominates the gap at this scene's PSNR ceiling
        "target_met_full_refined": (
            bool(target_met_raw
                 and control_val_psnr_refined - val_psnr_refined <= 2.0)
            if control_val_psnr_refined is not None
            and val_psnr_refined is not None else None
        ),
        "gauge_note": (
            "raw = direct per-pose errors vs GT (reference definition); "
            "aligned = after closed-form SIM(3) Umeyama alignment of "
            "camera centers. gauge_anchor pins the constellation to the "
            "init gauge during training, so raw converges to the "
            "raw_floor_* values (Karcher mean of the injected noise, "
            "~sigma/sqrt(N) — unobservable from training data). "
            "val_psnr_gauge_corrected renders val cameras mapped into the "
            "scene's estimated gauge by the fitted inverse SIM(3)."
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
