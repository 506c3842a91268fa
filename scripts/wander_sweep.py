"""Controlled pose-wander sweep: dB-vs-degrees at the north-star ceiling.

VERDICT r4 "Next round" #2: the claim that the recovered run's val-PSNR
gap vs its clean-init control is *explained by residual camera error at a
~50 dB ceiling* was argued, never measured. This measures it directly:

1. Train a clean scene (no pose noise anywhere) at the headline operating
   point (400^2, N=200 train cameras, MLP family) to convergence.
2. Inject calibrated SE(3) wander into the VAL cameras only — rotation
   sigma theta in degrees with translation sigma 1.1*theta % of camera
   distance (the recovered run's residual ratio, 0.18%/0.166 deg) — and
   measure val PSNR vs the UNTOUCHED ground-truth images, several
   independent draws per level.
3. The resulting curve dB(theta) lets the recovered-vs-control gap be
   read off: gap_predicted = dB(theta_control) - dB(theta_recovered).

Writes results/northstar_r5/wander_sweep.json (one dict; levels, per-draw
PSNRs, interpolated attribution for the round-4 headline pair
0.092 deg -> 0.166 deg).

Usage: python scripts/wander_sweep.py [--iters 20000] [--resolution 400]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robust_nerf_tpu.config import (  # noqa: E402
    DataConfig,
    ModelConfig,
    NeRFConfig,
    RenderConfig,
    TPUConfig,
    TrainConfig,
)
from robust_nerf_tpu.core.noise import add_noise_to_pose  # noqa: E402
from robust_nerf_tpu.data.banks import build_ray_bank  # noqa: E402
from robust_nerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from robust_nerf_tpu.core.se3 import pose_errors  # noqa: E402
from robust_nerf_tpu.evalx.metrics import compute_psnr  # noqa: E402
from robust_nerf_tpu.ops.rendering import render_image  # noqa: E402
from robust_nerf_tpu.training.steps import (  # noqa: E402
    create_train_state,
    make_train_chunk,
)
from robust_nerf_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--resolution", type=int, default=400)
    p.add_argument("--num_images", type=int, default=200)
    p.add_argument("--num_val", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--steps_per_scan", type=int, default=500)
    p.add_argument("--levels", type=float, nargs="+",
                   default=[0.0, 0.03, 0.05, 0.092, 0.13, 0.166, 0.25, 0.4])
    p.add_argument("--draws", type=int, default=3)
    p.add_argument("--trans_ratio", type=float, default=1.1,
                   help="translation wander in %%-of-distance per degree of "
                        "rotation wander (recovered-run residual ratio)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str,
                   default="results/northstar_r5/wander_sweep.json")
    args = p.parse_args(argv)

    enable_compilation_cache()
    cfg = NeRFConfig(
        model=ModelConfig(),
        render=RenderConfig(num_samples=64, num_samples_fine=128),
        data=DataConfig(batch_size=args.batch_size, source="synthetic"),
        train=TrainConfig(seed=args.seed, lr=5e-4),
        tpu=TPUConfig(steps_per_scan=args.steps_per_scan,
                      compute_dtype="bfloat16"),
    )
    scene = make_synthetic_scene(
        num_images=args.num_images, resolution=args.resolution,
        num_samples=256, textured=True,
    )
    val = make_synthetic_scene(
        num_images=args.num_val, resolution=args.resolution, split="val",
        num_samples=256, textured=True,
    )

    bank, _, _ = build_ray_bank(scene)
    state = create_train_state(jax.random.PRNGKey(args.seed), cfg)
    chunk = make_train_chunk(cfg, steps=args.steps_per_scan)
    t0 = time.time()
    i = 0
    while i < args.iters:
        state, m = chunk(state, bank, jax.random.PRNGKey(args.seed + 1))
        i += args.steps_per_scan
        print(f"iter {i:6d} loss {float(np.asarray(m['loss'])[-1]):.6f}",
              file=sys.stderr)
    train_wall = time.time() - t0

    def val_psnr_for_poses(poses):
        vals = []
        for k in range(val.images.shape[0]):
            out = render_image(
                state.models, poses[k], val.H, val.W, val.focal,
                cfg.render, cfg.model, cfg.tpu,
            )
            vals.append(
                float(compute_psnr(jnp.asarray(out["rgb"]), val.images[k]))
            )
        return float(np.mean(vals))

    base_poses = np.asarray(val.poses)
    camera_distance = float(np.mean(np.linalg.norm(base_poses[:, :3, 3], axis=-1)))
    results = []
    for theta in args.levels:
        draws = []
        n_draws = 1 if theta == 0.0 else args.draws
        for d in range(n_draws):
            rng = np.random.default_rng(10_000 + 97 * d + hash(theta) % 1000)
            wandered = []
            for k in range(base_poses.shape[0]):
                trans_std = (args.trans_ratio * theta / 100.0) * camera_distance
                pose, _ = add_noise_to_pose(
                    base_poses[k], rotation_noise_deg=theta,
                    translation_noise=trans_std, rng=rng,
                )
                wandered.append(pose)
            wandered = np.stack(wandered)
            errs = jax.device_get(
                pose_errors(jnp.asarray(wandered), jnp.asarray(base_poses))
            )
            psnr = val_psnr_for_poses(wandered)
            draws.append({
                "psnr": psnr,
                "realized_rot_deg": float(errs["mean_rotation_error_deg"]),
                "realized_trans": float(errs["mean_translation_error"]),
                "realized_trans_pct": float(
                    errs["mean_translation_error"] / camera_distance * 100.0
                ),
            })
            print(f"theta {theta:6.3f} deg draw {d}: "
                  f"psnr {psnr:.2f} (realized rot "
                  f"{draws[-1]['realized_rot_deg']:.3f} deg)", file=sys.stderr)
        results.append({
            "theta_deg": theta,
            "trans_pct": args.trans_ratio * theta,
            "draws": draws,
            "psnr_mean": float(np.mean([d["psnr"] for d in draws])),
            "psnr_std": float(np.std([d["psnr"] for d in draws])),
        })

    # attribution for the round-4 headline pair: control residual 0.092 deg
    # vs recovered residual 0.166 deg (NORTHSTAR.md)
    thetas = np.array([r["theta_deg"] for r in results])
    psnrs = np.array([r["psnr_mean"] for r in results])

    def interp(theta):
        return float(np.interp(theta, thetas, psnrs))

    attribution = {
        "control_residual_deg": 0.092,
        "recovered_residual_deg": 0.166,
        "psnr_at_control_residual": interp(0.092),
        "psnr_at_recovered_residual": interp(0.166),
        "predicted_gap_db": interp(0.092) - interp(0.166),
        "measured_gap_db_round4": 52.8 - 42.7,
        "note": (
            "predicted_gap_db is the PSNR cost of moving val-camera wander "
            "from the control run's residual to the recovered run's "
            "residual on a FIXED clean-trained scene; measured_gap_db is "
            "the round-4 control-vs-recovered val gap "
            "(results/northstar_r4/seed7_n200_400p_control.json)."
        ),
    }
    out = {
        "config": {
            "iters": args.iters, "resolution": args.resolution,
            "num_images": args.num_images, "num_val": args.num_val,
            "batch_size": args.batch_size, "trans_ratio": args.trans_ratio,
            "seed": args.seed, "architecture": "mlp",
        },
        "train_wall_s": train_wall,
        "clean_val_psnr": results[0]["psnr_mean"],
        "levels": results,
        "attribution": attribution,
        "backend": jax.default_backend(),
    }
    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("clean_val_psnr", "train_wall_s")} |
                     {"predicted_gap_db": attribution["predicted_gap_db"]}))


if __name__ == "__main__":
    main()
