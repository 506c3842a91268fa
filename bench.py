"""Benchmark — training throughput (rays/sec) on real hardware.

Measures the standard fixed-pose training path at the reference benchmark
configuration (lego-equivalent geometry: 400x400 half-res frames, 64 coarse
+ 128 fine hierarchical samples, full 8x256 MLPs; data is the procedural
analytic scene since the Blender set is not on disk — ray geometry, sample
counts and model sizes are identical, so throughput is comparable).

Prints the headline JSON line LAST (the driver records the final line):
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s",
   "vs_baseline": N / 9600, "batch_size": 4096}
vs_baseline compares against the reference's measured ~9.6k rays/s
(BASELINE.md: outputs/lego_clean_*/logs/train_metrics.csv median). The
headline config is batch 4096 rendered as scanned 256-ray MICROBATCHES
with one Adam update per batch (TPUConfig.microbatch, round 3): 256
rays/step is the measured v5e per-ray sweet spot (DESIGN.md roofline —
XLA's bwd materialization overhead shrinks at VMEM-scale working sets)
and 16 accumulations per update amortize the optimizer, measuring ~137k
rays/s vs 126.4k for plain batch 256 and 69.4k for a fused batch-4096
step. Microbatching preserves the optimizer semantics (mean-of-means
grads, one update per batch — tests/test_microbatch.py), so an iso-batch
line is also printed first at the reference's own batch 1024
(noisy_src/config.py:46-56, microbatch 256, ~133k rays/s):
  {"metric": "train_rays_per_sec_iso_batch1024", ...}
Both lines chunk scan steps to ~204.8k rays per host round-trip
(steps_per_scan = 204800/batch, a production knob — the train CLIs
accept --steps_per_scan) so dispatch overhead per ray is equalized
across batch sizes.

BENCH_MODE=pose_opt instead measures the joint pose-optimization step and
prints {"metric": "pose_opt_rays_per_sec", ..., "vs_baseline": N / 4520}
against the reference's pose-opt-path median.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_RAYS_PER_SEC = 9600.0   # BASELINE.md standard-path median
REFERENCE_POSE_OPT_RAYS_PER_SEC = 4520.0   # BASELINE.md pose-opt-path median


def measure(batch: int, scan: int, scene, on_accel: bool,
            microbatch: int | None = None):
    """Compile + run the configured step at `batch`; return (metric, rate,
    ref) for one JSON line. `microbatch` (None = BENCH_MICROBATCH env, 0 =
    off) renders the batch as scanned microbatches with ONE optimizer
    update per batch — same optimizer semantics, small-batch per-ray cost."""
    from robust_nerf_tpu.config import (
        DataConfig,
        ModelConfig,
        NeRFConfig,
        RenderConfig,
        TPUConfig,
        TrainConfig,
    )
    from robust_nerf_tpu.data.banks import build_ray_bank
    from robust_nerf_tpu.training.steps import create_train_state, make_train_chunk

    cfg = NeRFConfig(
        model=ModelConfig(),
        render=RenderConfig(num_samples=64, num_samples_fine=128),
        data=DataConfig(batch_size=batch, source="synthetic"),
        train=TrainConfig(seed=0),
        tpu=TPUConfig(
            steps_per_scan=scan,
            compute_dtype=os.environ.get(
                "BENCH_DTYPE", "bfloat16" if on_accel else "float32"
            ),
            remat=os.environ.get("BENCH_REMAT", "0") == "1",
            # default: the production "auto" policy (XLA-noremat train
            # step — measured fastest; see ops/pallas/__init__.py)
            use_pallas={"1": "on", "0": "off"}.get(
                os.environ.get("BENCH_PALLAS", "auto"), "auto"
            ),
            fused_resample=os.environ.get("BENCH_RESAMPLE", "auto"),
            f8_residuals=os.environ.get("BENCH_F8", "0") == "1",
            microbatch=(
                int(os.environ.get("BENCH_MICROBATCH", "0"))
                if microbatch is None else microbatch
            ),
        ),
    )

    # BENCH_MODE=pose_opt measures the JOINT pose-optimization step (full
    # differentiation through ray generation + SE(3) deltas) — comparable
    # to BASELINE.md's pose-opt-path row (~4,520 rays/s on the reference).
    mode = os.environ.get("BENCH_MODE", "train")
    if mode == "pose_opt":
        from robust_nerf_tpu.config import PoseOptConfig
        from robust_nerf_tpu.data.banks import build_pixel_bank
        from robust_nerf_tpu.training.steps import (
            create_pose_opt_state,
            make_pose_opt_chunk,
        )

        cfg.pose_opt = PoseOptConfig(pose_opt_delay=0)
        bank = build_pixel_bank(scene)
        state = create_pose_opt_state(
            jax.random.PRNGKey(0), cfg, jnp.asarray(scene.poses)
        )
        chunk = make_pose_opt_chunk(cfg, steps=scan)
        metric = "pose_opt_rays_per_sec"
        ref = REFERENCE_POSE_OPT_RAYS_PER_SEC
    else:
        bank, _, _ = build_ray_bank(scene)
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        chunk = make_train_chunk(cfg, steps=scan)
        metric = "train_rays_per_sec"
        ref = REFERENCE_RAYS_PER_SEC
    key = jax.random.PRNGKey(1)

    # warmup/compile. Sync via a HOST VALUE FETCH, not block_until_ready:
    # over the axon tunnel block_until_ready returns early (CLAUDE.md);
    # only pulling a value back to the host reliably waits for the step.
    state, m = chunk(state, bank, key)
    float(np.asarray(m["loss"]).sum())

    # timed: several chunks, take the median (steady-state) rate
    rates = []
    for _ in range(5 if on_accel else 2):
        t0 = time.perf_counter()
        state, m = chunk(state, bank, key)
        float(np.asarray(m["loss"]).sum())
        dt = time.perf_counter() - t0
        rates.append(scan * batch / dt)
    return metric, float(np.median(rates)), ref


def main():
    from robust_nerf_tpu.data.synthetic import make_synthetic_scene
    from robust_nerf_tpu.utils.compile_cache import enable_compilation_cache

    # Persist compiled programs across bench runs (skips the setup compile
    # only — steady-state rays/s is measured after warmup either way).
    enable_compilation_cache(os.environ.get("BENCH_COMPILE_CACHE", "auto"))

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"

    # Batch 4096 rendered as scanned 256-ray microbatches with one Adam
    # update per batch: 256 rays/step is the measured v5e per-ray sweet
    # spot (XLA's bwd materialization overhead shrinks at VMEM-scale
    # working sets — DESIGN.md roofline) and accumulating 16 microbatches
    # per update amortizes the optimizer, saturating ~137k rays/s at
    # batch 4096 (vs 126.4k for plain batch 256, 69.4k for fused batch
    # 4096). Same optimizer semantics as a fused step at the same
    # batch (mean-of-means grads; tests/test_microbatch.py).
    # CPU fallback keeps small shapes so the bench still runs.
    # BENCH_BATCH/BENCH_MICROBATCH/BENCH_DTYPE/BENCH_REMAT override.
    batch = int(os.environ.get("BENCH_BATCH", 4096 if on_accel else 512))
    scan = int(
        os.environ.get("BENCH_SCAN", max(1, 204800 // batch) if on_accel else 10)
    )

    # 400x400-equivalent ray bank (20 frames is plenty for a throughput bench)
    res = 400 if on_accel else 64
    scene = make_synthetic_scene(num_images=20, resolution=res, num_samples=128)

    # Iso-batch line first (reference trains batch 1024 — noisy_src/
    # config.py:46-56 — so this vs_baseline is apples-to-apples). Skipped
    # when BENCH_BATCH is set explicitly (tuning runs) or on CPU fallback.
    if "BENCH_BATCH" not in os.environ and on_accel:
        metric, value, ref = measure(
            1024, 204800 // 1024, scene, on_accel, microbatch=256
        )
        print(
            json.dumps(
                {
                    "metric": f"{metric}_iso_batch1024",
                    "value": round(value, 1),
                    "unit": "rays/s",
                    "vs_baseline": round(value / ref, 3),
                    "batch_size": 1024,
                }
            ),
            flush=True,
        )

    # headline line LAST (driver records the final line). Microbatch 256
    # by default on the accelerator (see sweet-spot note above); BENCH_
    # MICROBATCH overrides, 0 disables.
    mb_default = 256 if (on_accel and batch > 256 and batch % 256 == 0) else 0
    mb = int(os.environ.get("BENCH_MICROBATCH", str(mb_default)))
    metric, value, ref = measure(batch, scan, scene, on_accel, microbatch=mb)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": "rays/s",
                "vs_baseline": round(value / ref, 3),
                "batch_size": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
