"""Eval/serving-path profiler — full-frame render cost vs tile size.

Sweeps TPUConfig.eval_tile x pallas-eval policy for the full-frame
hierarchical render (`ops.rendering.render_image`, the inference/val hot
path — reference equivalent: noisy_src/train.py:122-160 chunk loop) and
prints one JSON line per config. The train path's round-3 finding was
that per-ray cost falls sharply at VMEM-scale working sets (batch 256);
this measures whether the forward-only eval path has the same optimum
and whether the fused-Pallas-eval-forward policy still wins there.

Timing is host-fetch synced (the only reliable method over the tunnel;
CLAUDE.md): each rep pulls the rendered frame's sum back to the host.
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

import robust_nerf_tpu as rn  # noqa: E402
from robust_nerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from robust_nerf_tpu.models.nerf import init_nerf_params  # noqa: E402
from robust_nerf_tpu.ops.rendering import render_image  # noqa: E402


def time_config(models, pose, res, focal, render_cfg, model_cfg, tile,
                pallas, reps, dtype):
    tpu_cfg = rn.TPUConfig(eval_tile=tile, use_pallas=pallas,
                           compute_dtype=dtype)
    out = render_image(models, pose, res, res, focal, render_cfg, model_cfg,
                       tpu_cfg)
    float(jnp.sum(out["rgb"]))  # sync after compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = render_image(models, pose, res, res, focal, render_cfg,
                           model_cfg, tpu_cfg)
        float(jnp.sum(out["rgb"]))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    n_rays = res * res
    rec = {
        "eval_tile": tile,
        "use_pallas": pallas,
        "dtype": dtype,
        "ms_per_frame": round(med * 1e3, 1),
        "fps": round(1.0 / med, 3),
        "rays_per_sec": round(n_rays / med, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--resolution", type=int, default=400)
    p.add_argument("--tiles", type=int, nargs="+",
                   default=[256, 512, 1024, 2048, 4096, 8192])
    p.add_argument("--pallas", nargs="+", default=["on", "off"],
                   help='policies to sweep: "on" = fused Pallas eval '
                        'forward, "off" = plain XLA ("auto" resolves to '
                        'XLA for eval since round 3, so sweeping it would '
                        'just duplicate "off")')
    p.add_argument("--dtype", nargs="+", default=["bfloat16"],
                   help="compute dtypes to sweep (bfloat16 / float32)")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args(argv)

    cfg = rn.NeRFConfig(
        render=rn.RenderConfig(num_samples=64, num_samples_fine=128)
    )
    scene = make_synthetic_scene(num_images=1, resolution=16, num_samples=8)
    key = jax.random.PRNGKey(0)
    models = {
        "coarse": init_nerf_params(key, cfg.model),
        "fine": init_nerf_params(jax.random.split(key)[0], cfg.model),
    }
    pose = jnp.asarray(scene.poses[0])
    focal = float(scene.focal) * args.resolution / scene.W

    best = None
    for dtype in args.dtype:
        for pallas in args.pallas:
            for tile in args.tiles:
                rec = time_config(models, pose, args.resolution, focal,
                                  cfg.render, cfg.model, tile, pallas,
                                  args.reps, dtype)
                if best is None or rec["rays_per_sec"] > best["rays_per_sec"]:
                    best = rec
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
