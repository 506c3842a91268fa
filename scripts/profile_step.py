"""Train-step cost ablation — where does the step time go?

Times the scanned train chunk under component ablations (coarse-only,
no-hierarchical-resample, reduced samples, dtype) to attribute cost between
MLP eval, PDF resampling, and compositing. Informs kernel-fusion priorities.
Prints one JSON line per ablation. Timing is host-fetch-synced (the only
reliable method over the tunnel; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

import robust_nerf_tpu as rn  # noqa: E402
from robust_nerf_tpu.data.banks import build_ray_bank  # noqa: E402
from robust_nerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from robust_nerf_tpu.training.steps import create_train_state, make_train_chunk  # noqa: E402


def time_config(name, bank, batch, render_cfg, dtype="bfloat16", remat=True,
                pallas=False, scan=50, reps=3):
    cfg = rn.NeRFConfig()
    cfg.data.batch_size = batch
    cfg.render = render_cfg
    cfg.tpu = rn.TPUConfig(steps_per_scan=scan, compute_dtype=dtype,
                           remat=remat, use_pallas=pallas)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    chunk = make_train_chunk(cfg, steps=scan)
    state, m = chunk(state, bank, jax.random.PRNGKey(1))
    float(m["loss"][-1])   # sync after compile
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        state, m = chunk(state, bank, jax.random.PRNGKey(1))
        float(m["loss"][-1])
        best = max(best, scan * batch / (time.time() - t0))
    print(json.dumps({"ablation": name, "rays_per_sec": round(best, 1),
                      "ms_per_step": round(scan * batch / best / scan * 1e3, 2)}))
    return best


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--resolution", type=int, default=200)
    args = p.parse_args(argv)

    scene = make_synthetic_scene(num_images=8, resolution=args.resolution,
                                 num_samples=128)
    bank, _, _ = build_ray_bank(scene)
    B = args.batch

    time_config("full_64+128_bf16", bank, B,
                rn.RenderConfig(num_samples=64, num_samples_fine=128))
    time_config("full_64+128_f32", bank, B,
                rn.RenderConfig(num_samples=64, num_samples_fine=128),
                dtype="float32")
    time_config("coarse_only_64", bank, B,
                rn.RenderConfig(num_samples=64, use_hierarchical=False))
    time_config("coarse_only_192", bank, B,
                rn.RenderConfig(num_samples=192, use_hierarchical=False))
    time_config("full_64+128_noremat", bank, B,
                rn.RenderConfig(num_samples=64, num_samples_fine=128),
                remat=False)
    time_config("full_64+128_pallas_fwd", bank, B,
                rn.RenderConfig(num_samples=64, num_samples_fine=128),
                pallas=True)


if __name__ == "__main__":
    main()
