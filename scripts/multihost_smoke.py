"""Two-process multi-host smoke test on CPU (gloo collectives).

Validates the pod-scale path that cannot be exercised on the single
tunneled chip: `jax.distributed.initialize` with a real coordinator, a
global mesh spanning processes, per-process (host-sharded) batch placement,
psum'd gradients across processes, and primary-host-only logging — the
same code path `--multihost` enables in the training CLIs
(training/train.py:maybe_init_multihost; the reference is single-process,
SURVEY.md §5.8).

Run: python scripts/multihost_smoke.py            (parent; spawns 2 workers)
     each worker gets 4 virtual CPU devices -> 8 global devices.
Prints MULTIHOST_SMOKE_OK on success.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

NUM_PROCS = 2
LOCAL_DEVICES = 4
PORT = 12765


def worker(process_id: int) -> None:
    # Force the CPU backend before jax initializes (CLAUDE.md gotcha: the
    # sitecustomize re-registers the TPU plugin unless this is unset).
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NUM_PROCS,
        process_id=process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO))
    from robust_nerf_tpu.config import (
        DataConfig, ModelConfig, NeRFConfig, RenderConfig, TPUConfig,
        TrainConfig,
    )
    from robust_nerf_tpu.data.banks import build_ray_bank
    from robust_nerf_tpu.data.synthetic import make_synthetic_scene
    from robust_nerf_tpu.parallel.mesh import (
        create_mesh, is_primary_host, replicate,
    )
    from robust_nerf_tpu.training.steps import (
        create_train_state, make_train_chunk,
    )

    assert jax.process_count() == NUM_PROCS
    assert jax.device_count() == NUM_PROCS * LOCAL_DEVICES

    cfg = NeRFConfig(
        model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                          num_hidden_layers=2, skips=(0,)),
        render=RenderConfig(num_samples=8, num_samples_fine=8),
        data=DataConfig(batch_size=16 * jax.device_count(), source="synthetic"),
        train=TrainConfig(seed=0),
        tpu=TPUConfig(steps_per_scan=5),
    )
    # identical host-side data on every process (the banks path); the mesh
    # spans all 8 global devices
    scene = make_synthetic_scene(num_images=4, resolution=16, num_samples=32)
    bank, _, _ = build_ray_bank(scene)
    mesh = create_mesh()
    state = replicate(create_train_state(jax.random.PRNGKey(0), cfg), mesh)
    bank = replicate(bank, mesh)

    chunk = make_train_chunk(cfg, mesh=mesh, steps=5)
    state, metrics = chunk(state, bank, jax.random.PRNGKey(1))
    losses = np.asarray(jax.device_get(metrics["loss"]))
    assert np.all(np.isfinite(losses)), losses

    # every process must hold the identical replicated model after psum'd
    # updates — compare a parameter checksum across processes
    checksum = jnp.zeros(())
    for leaf in jax.tree_util.tree_leaves(state.models):
        checksum = checksum + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(jax.device_get(checksum))
    )
    assert np.allclose(gathered, gathered[0], rtol=1e-6), gathered

    if is_primary_host():
        print(
            f"MULTIHOST_SMOKE_OK procs={jax.process_count()} "
            f"devices={jax.device_count()} loss={losses[-1]:.5f} "
            f"checksums={gathered.round(3).tolist()}",
            flush=True,
        )


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return 0

    procs = []
    for pid in range(NUM_PROCS):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(
            subprocess.Popen(
                [sys.executable, __file__, "--worker", str(pid)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0:
            ok = False
            print(f"--- worker {pid} FAILED (rc={p.returncode}) ---")
        tail = "\n".join(out.strip().splitlines()[-10:])
        if "MULTIHOST_SMOKE_OK" in out:
            print([l for l in out.splitlines() if "MULTIHOST_SMOKE_OK" in l][0])
        elif not ok:
            print(tail)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
