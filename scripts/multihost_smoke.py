"""Two-process multi-host validation on CPU (gloo collectives).

Validates the pod-scale path that cannot be exercised on the single
tunneled chip: `jax.distributed.initialize` with a real coordinator, a
global mesh spanning processes, per-process (host-sharded) batch placement,
psum'd gradients across processes, and primary-host-only logging — the
same code path `--multihost` enables in the training CLIs
(training/train.py:maybe_init_multihost; the reference is single-process,
SURVEY.md §5.8).

Three checks, strictly stronger than a liveness smoke:
1. convergence — 100 training iterations must cut the loss to <70% of the
   first-chunk mean (real optimization through gloo collectives; measured
   ratio ~0.49 at this config);
2. replication — every process holds a bit-identical model after psum'd
   updates (parameter checksum allgather);
3. trajectory equivalence — the 2-process/8-device gloo run must produce
   the same per-chunk loss trajectory as a single-process 8-device run of
   the identical config/seed/data (multi-host introduces no numerical or
   semantic drift vs the already-validated single-process sharded path,
   which tests/test_sharding.py ties to the 1-device path).

All three checks run for BOTH step types: standard training AND the joint
pose-opt step, whose per-image SE(3) pose gradients are the one
cross-shard-coupled quantity (SURVEY.md §5.7) and therefore the part
multi-process psum must get right.

Run: python scripts/multihost_smoke.py            (parent; spawns 2 workers
     + 1 single-process control) — each worker gets 4 virtual CPU devices
     -> 8 global devices. Prints MULTIHOST_SMOKE_OK and MULTIHOST_EQUIV_OK
     on success.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

NUM_PROCS = 2
LOCAL_DEVICES = 4
PORT = 12765
NUM_CHUNKS = 20  # x steps_per_scan=5 -> 100 training iterations


def _force_cpu(num_devices: int) -> None:
    # Force the CPU backend before jax initializes (CLAUDE.md gotcha: the
    # sitecustomize re-registers the TPU plugin unless this is unset).
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", num_devices)


def _run_trajectory(mode: str = "train"):
    """Train NUM_CHUNKS scan-chunks on the global mesh; return the
    per-chunk mean-loss list and the final state. Identical config/data/
    seed regardless of process topology, so trajectories are comparable.

    mode="pose_opt" runs the joint NeRF+SE(3) step instead: per-image pose
    gradients are the one cross-shard-coupled quantity (SURVEY.md §5.7), so
    they are exactly what multi-process psum must get right."""
    import jax
    import numpy as np

    sys.path.insert(0, str(REPO))
    from robust_nerf_tpu.config import (
        DataConfig, ModelConfig, NeRFConfig, PoseOptConfig, RenderConfig,
        TPUConfig, TrainConfig,
    )
    from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_poses
    from robust_nerf_tpu.data.banks import build_pixel_bank, build_ray_bank
    from robust_nerf_tpu.data.synthetic import make_synthetic_scene
    from robust_nerf_tpu.parallel.mesh import create_mesh, replicate
    from robust_nerf_tpu.training.steps import (
        create_pose_opt_state,
        create_train_state,
        make_pose_opt_chunk,
        make_train_chunk,
    )

    cfg = NeRFConfig(
        model=ModelConfig(pos_freqs=4, dir_freqs=2, hidden_dim=32,
                          num_hidden_layers=2, skips=(0,)),
        render=RenderConfig(num_samples=8, num_samples_fine=8),
        data=DataConfig(batch_size=16 * jax.device_count(), source="synthetic"),
        train=TrainConfig(seed=0),
        pose_opt=PoseOptConfig(pose_lr=1e-3, pose_opt_delay=0,
                               rotation_reg_weight=0.0,
                               translation_reg_weight=0.0),
        # microbatch=32 (4 microbatches of the 128-ray batch) so every
        # multihost assertion — convergence, bit-identical replication,
        # trajectory equivalence vs single-process — exercises the
        # microbatched gradient-accumulation step across processes (auto
        # would resolve to off on the CPU backend).
        tpu=TPUConfig(steps_per_scan=5, microbatch=32),
    )
    # identical host-side data on every process (the banks path); the mesh
    # spans all global devices
    scene = make_synthetic_scene(num_images=4, resolution=16, num_samples=32)
    mesh = create_mesh()
    if mode == "pose_opt":
        noisy_poses, _ = add_noise_to_poses(
            np.asarray(scene.poses),
            NoiseConfig(rotation_noise_deg=2.0, seed=3),
        )
        bank = replicate(build_pixel_bank(scene), mesh)
        state = replicate(
            create_pose_opt_state(jax.random.PRNGKey(0), cfg, noisy_poses),
            mesh,
        )
        chunk = make_pose_opt_chunk(cfg, mesh=mesh, steps=5)
    else:
        bank, _, _ = build_ray_bank(scene)
        bank = replicate(bank, mesh)
        state = replicate(create_train_state(jax.random.PRNGKey(0), cfg), mesh)
        chunk = make_train_chunk(cfg, mesh=mesh, steps=5)

    losses = []
    for i in range(NUM_CHUNKS):
        state, metrics = chunk(state, bank, jax.random.PRNGKey(1 + i))
        arr = np.asarray(jax.device_get(metrics["loss"]), dtype=np.float64)
        assert np.all(np.isfinite(arr)), arr
        losses.append(float(arr.mean()))
    return losses, state


def worker(process_id: int) -> None:
    _force_cpu(LOCAL_DEVICES)

    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=NUM_PROCS,
        process_id=process_id,
    )

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO))
    from robust_nerf_tpu.parallel.mesh import is_primary_host

    assert jax.process_count() == NUM_PROCS
    assert jax.device_count() == NUM_PROCS * LOCAL_DEVICES

    from jax.experimental import multihost_utils

    def replication_checksum(state):
        # every process must hold identical replicated state after psum'd
        # updates — compare a checksum of models (+ pose deltas) across
        # processes
        checksum = jnp.zeros(())
        leaves = jax.tree_util.tree_leaves(state.models)
        if hasattr(state, "pose_params"):
            leaves += jax.tree_util.tree_leaves(state.pose_params)
        for leaf in leaves:
            checksum = checksum + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
        gathered = np.asarray(
            multihost_utils.process_allgather(jax.device_get(checksum))
        )
        assert np.allclose(gathered, gathered[0], rtol=1e-6), gathered
        return gathered

    losses, state = _run_trajectory()

    # convergence: 100 iterations must actually optimize, not just run
    # (measured ratio ~0.49 at this tiny config; 0.7 leaves safety margin)
    assert losses[-1] < 0.7 * losses[0], losses
    gathered = replication_checksum(state)

    # the joint pose-opt step: per-image pose grads psum across processes
    po_losses, po_state = _run_trajectory(mode="pose_opt")
    assert po_losses[-1] < 0.7 * po_losses[0], po_losses
    replication_checksum(po_state)

    if is_primary_host():
        print("MULTIHOST_TRAJECTORY " + json.dumps(losses), flush=True)
        print("MULTIHOST_POSEOPT_TRAJECTORY " + json.dumps(po_losses),
              flush=True)
        print(
            f"MULTIHOST_SMOKE_OK procs={jax.process_count()} "
            f"devices={jax.device_count()} loss_first={losses[0]:.5f} "
            f"loss_last={losses[-1]:.5f} "
            f"checksums={gathered.round(3).tolist()}",
            flush=True,
        )


def single_control() -> None:
    """Single-process 8-device control run of the identical trajectory."""
    _force_cpu(NUM_PROCS * LOCAL_DEVICES)

    import jax

    assert jax.process_count() == 1
    assert jax.device_count() == NUM_PROCS * LOCAL_DEVICES
    losses, _ = _run_trajectory()
    print("SINGLE_TRAJECTORY " + json.dumps(losses), flush=True)
    po_losses, _ = _run_trajectory(mode="pose_opt")
    print("SINGLE_POSEOPT_TRAJECTORY " + json.dumps(po_losses), flush=True)


def _extract(out: str, tag: str):
    for line in out.splitlines():
        if line.startswith(tag + " "):
            return json.loads(line[len(tag) + 1:])
    return None


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        single_control()
        return 0

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(NUM_PROCS)
    ]
    # the single-process control shares no coordinator; run it alongside
    control = subprocess.Popen(
        [sys.executable, __file__, "--single"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )

    ok = True
    multi_traj = None
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        if p.returncode != 0:
            ok = False
            print(f"--- worker {pid} FAILED (rc={p.returncode}) ---")
            print("\n".join(out.strip().splitlines()[-15:]))
            continue
        if "MULTIHOST_SMOKE_OK" in out:
            print([l for l in out.splitlines()
                   if "MULTIHOST_SMOKE_OK" in l][0])
            multi_traj = _extract(out, "MULTIHOST_TRAJECTORY")
            multi_po = _extract(out, "MULTIHOST_POSEOPT_TRAJECTORY")

    out, _ = control.communicate(timeout=900)
    single_traj = _extract(out, "SINGLE_TRAJECTORY")
    single_po = _extract(out, "SINGLE_POSEOPT_TRAJECTORY")
    if control.returncode != 0 or single_traj is None:
        ok = False
        print(f"--- single control FAILED (rc={control.returncode}) ---")
        print("\n".join(out.strip().splitlines()[-15:]))

    def compare(tag, multi, single):
        import numpy as np

        if multi is None or single is None:
            print(f"{tag}_FAIL missing trajectories")
            return False
        a, b = np.asarray(multi), np.asarray(single)
        # gloo vs local collectives may reassociate reductions -> tiny FP
        # drift compounding over 100 iters; the trajectories must still
        # agree closely chunk-for-chunk
        if np.allclose(a, b, rtol=2e-3, atol=1e-6):
            print(
                f"{tag}_OK max_rel_diff="
                f"{float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-12))):.2e}"
            )
            return True
        print(f"{tag}_FAIL")
        print("multi :", a.tolist())
        print("single:", b.tolist())
        return False

    if ok:
        ok = compare("MULTIHOST_EQUIV", multi_traj, single_traj) and ok
        ok = compare("MULTIHOST_POSEOPT_EQUIV", multi_po, single_po) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
