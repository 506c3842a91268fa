"""Multi-scene benchmark sweep — train + test-eval every scene.

BASELINE.json stretch config: "all 8 Blender synthetic scenes batched on
v4-8 at 800x800 with test-set renders + PSNR/SSIM/LPIPS sweep". Runs each
scene's standard training followed by test-set evaluation and aggregates
one results table (CSV + JSON). Without the dataset on disk it degrades to
the procedural synthetic scene so the pipeline stays exercisable.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robust_nerf_tpu.config import (  # noqa: E402
    DataConfig,
    NeRFConfig,
    RenderConfig,
    TPUConfig,
    TrainConfig,
)
from robust_nerf_tpu.data.synthetic import SYNTHETIC_SCENES, load_scene  # noqa: E402
from robust_nerf_tpu.evalx.inference import evaluate_test_set, load_checkpoint  # noqa: E402
from robust_nerf_tpu.training.train import train  # noqa: E402

BLENDER_SCENES = [
    "chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship",
]


def main(argv=None):
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--scenes", nargs="*", default=None,
                        help="default: the 8 Blender scenes (or 'synthetic')")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--data_source", default="blender",
                        choices=["blender", "synthetic"])
    parser.add_argument("--img_scale", type=float, default=1.0,
                        help="1.0 = full 800x800")
    parser.add_argument("--num_iters", type=int, default=50000)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--output_dir", default="outputs/scene_sweep")
    parser.add_argument("--max_test_images", type=int, default=None)
    parser.add_argument("--synthetic_resolution", type=int, default=800,
                        help="frame size for the procedural family "
                             "(800 matches the Blender sweep's full res)")
    parser.add_argument("--synthetic_textured", action="store_true")
    parser.add_argument("--val_every", type=int, default=None,
                        help="default: num_iters (final eval only)")
    args = parser.parse_args(argv)

    # Without the Blender set on disk, the synthetic source sweeps the
    # 8-member procedural family (data/synthetic.py SYNTHETIC_SCENES) —
    # 8 geometrically distinct scenes, same count as the Blender sweep.
    scenes = args.scenes or (
        BLENDER_SCENES if args.data_source == "blender"
        else list(SYNTHETIC_SCENES)
    )
    out_root = Path(args.output_dir)
    out_root.mkdir(parents=True, exist_ok=True)

    rows = []
    for scene in scenes:
        print(f"=== scene: {scene} ===")
        cfg = NeRFConfig(
            render=RenderConfig(),
            data=DataConfig(
                scene_name=scene,
                data_root=args.data_root,
                img_scale=args.img_scale,
                batch_size=args.batch_size,
                source=args.data_source,
                synthetic_resolution=args.synthetic_resolution,
                synthetic_textured=args.synthetic_textured,
            ),
            train=TrainConfig(
                num_iterations=args.num_iters,
                output_dir=out_root,
                experiment_name=f"{scene}_sweep",
                val_every=args.val_every or args.num_iters,
            ),
            tpu=TPUConfig(compute_dtype=args.compute_dtype),
        )
        t0 = time.time()
        try:
            summary = train(cfg)
        except FileNotFoundError as e:
            print(f"  skipping {scene}: {e}")
            continue
        run_dir = out_root / f"{scene}_sweep"
        models, ck_cfg, _, _ = load_checkpoint(run_dir)
        try:
            test_scene = load_scene(ck_cfg.data, "test")
        except FileNotFoundError:
            test_scene = load_scene(ck_cfg.data, "val")
        agg = evaluate_test_set(
            models, ck_cfg, test_scene, run_dir / "test_eval",
            max_images=args.max_test_images,
        )
        rows.append(
            {
                "scene": scene,
                "test_psnr": agg["psnr_mean"],
                "test_ssim": agg["ssim_mean"],
                "test_lpips": agg.get("lpips_mean"),
                "test_ms_ssim": agg.get("ms_ssim_mean"),
                "val_psnr": summary.get("final_val_psnr"),
                "wall_time_s": round(time.time() - t0, 1),
            }
        )
        print(f"  {scene}: test PSNR {agg['psnr_mean']:.2f} "
              f"SSIM {agg['ssim_mean']:.4f}")

    with open(out_root / "sweep_results.json", "w") as f:
        json.dump(rows, f, indent=2)
    import csv

    if rows:
        with open(out_root / "sweep_results.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    print(f"\nresults -> {out_root}/sweep_results.{{json,csv}}")
    for r in rows:
        print(f"  {r['scene']:12s} PSNR {r['test_psnr']:.2f} "
              f"SSIM {r['test_ssim']:.4f}")


if __name__ == "__main__":
    main()
