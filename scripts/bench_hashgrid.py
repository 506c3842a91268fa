"""Time-to-quality benchmark: hash-grid family vs the parity MLP.

Trains both families on the identical procedural scene (400x400-equivalent
geometry, same ray bank, same optimizer/schedule machinery) and records the
wall-clock needed to reach PSNR milestones on held-out validation frames.
The headline milestone is 25.53 dB — the reference's measured clean-baseline
final PSNR (outputs/lego_clean_20251206_210328/summary.json, 10k iters,
1891 s on its GPU; BASELINE.md).

Timing follows CLAUDE.md: every segment ends in a host-value fetch (the val
render is pulled to the host for PSNR), so tunnel-async can't flatter it.

Usage: python scripts/bench_hashgrid.py [--iters 3000] [--check_every 200]
Writes results/hashgrid/time_to_quality.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robust_nerf_tpu.config import (  # noqa: E402
    DataConfig,
    ModelConfig,
    NeRFConfig,
    RenderConfig,
    TPUConfig,
    TrainConfig,
)
from robust_nerf_tpu.data.banks import build_ray_bank  # noqa: E402
from robust_nerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from robust_nerf_tpu.evalx.metrics import compute_psnr  # noqa: E402
from robust_nerf_tpu.ops.rendering import render_image  # noqa: E402
from robust_nerf_tpu.training.steps import (  # noqa: E402
    create_train_state,
    hashgrid_scan_cap,
    make_train_chunk,
)
from robust_nerf_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

MILESTONES = (22.0, 25.53, 28.0, 30.0)


def run_family(name, model_cfg, lr, scene, val_scene, iters, check_every,
               batch, on_accel):
    cfg = NeRFConfig(
        model=model_cfg,
        render=RenderConfig(num_samples=64, num_samples_fine=128),
        data=DataConfig(batch_size=batch, source="synthetic"),
        train=TrainConfig(seed=0, lr=lr),
        tpu=TPUConfig(
            steps_per_scan=check_every,
            compute_dtype="bfloat16" if on_accel else "float32",
        ),
    )
    bank, _, _ = build_ray_bank(scene)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    # scan cap: long scans of the gather-heavy hashgrid step crash the
    # TPU worker (training/steps.py HASHGRID_MAX_SCAN_TPU); run
    # ceil(check_every / n_scan) chunks per checkpoint instead.
    n_scan = min(hashgrid_scan_cap(cfg), check_every)
    chunk = make_train_chunk(cfg, steps=n_scan)

    def val_psnr(models):
        vals = []
        for i in range(val_scene.images.shape[0]):
            out = render_image(
                models, val_scene.poses[i], val_scene.H, val_scene.W,
                val_scene.focal, cfg.render, cfg.model, cfg.tpu,
            )
            vals.append(float(compute_psnr(
                np.asarray(out["rgb"]), np.asarray(val_scene.images[i]))))
        return float(np.mean(vals))

    # compile outside the timed region (both the chunk and the val render)
    key = jax.random.PRNGKey(1)
    wstate, m = chunk(state, bank, key)
    float(np.asarray(m["loss"]).sum())
    val_psnr(wstate.models)
    del wstate

    traj, reached = [], {}
    t0 = time.perf_counter()
    it = 0
    while it < iters:
        for _ in range(max(1, check_every // n_scan)):
            key, k = jax.random.split(key)
            state, m = chunk(state, bank, k)
        float(np.asarray(m["loss"]).sum())   # host sync: honest step timing
        it += check_every
        t_train = time.perf_counter() - t0
        psnr = val_psnr(state.models)
        traj.append({"iter": it, "wall_s": round(t_train, 2),
                     "val_psnr": round(psnr, 3)})
        print(f"  {name} iter {it}: {psnr:.2f} dB @ {t_train:.1f}s")
        for ms in MILESTONES:
            if psnr >= ms and ms not in reached:
                reached[ms] = {"iter": it, "wall_s": round(t_train, 2)}
        # val renders are excluded from the training clock
        t0 = time.perf_counter() - t_train
    return {
        "family": name,
        "lr": lr,
        "batch": batch,
        "iters": iters,
        "trajectory": traj,
        "milestones_db_to_wall_s": {
            str(k): v for k, v in sorted(reached.items())
        },
        "final_val_psnr": traj[-1]["val_psnr"] if traj else None,
        "train_wall_s": traj[-1]["wall_s"] if traj else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--check_every", type=int, default=200)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--families", type=str, default="hashgrid,mlp")
    ap.add_argument("--out", type=str,
                    default="results/hashgrid/time_to_quality.json")
    args = ap.parse_args()

    enable_compilation_cache("auto")
    on_accel = jax.devices()[0].platform != "cpu"
    res = 400 if on_accel else 48
    scene = make_synthetic_scene(num_images=20, resolution=res,
                                 num_samples=128, textured=True)
    val_scene = make_synthetic_scene(num_images=3, resolution=res,
                                     split="val", num_samples=128,
                                     textured=True)

    results = {
        "platform": jax.devices()[0].platform,
        "resolution": res,
        "reference_anchor": {
            "note": "reference clean baseline: 25.53 dB final @10k iters, "
                    "1891 s (outputs/lego_clean_20251206_210328, "
                    "different scene/hardware — anchor, not iso-data)",
        },
        "runs": [],
    }
    for fam in args.families.split(","):
        if fam == "hashgrid":
            mcfg = ModelConfig(architecture="hashgrid")
            lr = 1e-2
        else:
            mcfg = ModelConfig()
            lr = 5e-4
        print(f"== {fam} ==")
        results["runs"].append(run_family(
            fam, mcfg, lr, scene, val_scene, args.iters, args.check_every,
            args.batch, on_accel,
        ))

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
