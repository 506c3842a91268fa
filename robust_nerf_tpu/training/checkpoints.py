"""Checkpointing — npz pytree snapshots with the reference's naming scheme,
plus an optional orbax backend for multi-host runs.

Reference layout (noisy_src/train.py:236-304): checkpoint_{iter:07d},
checkpoint_latest, checkpoint_best (by val PSNR), each containing model +
optimizer state + full config + noise config + metrics. Here a checkpoint
is one .npz holding every pytree leaf (flattened, order-stable) plus a JSON
metadata blob; restore unflattens into a template state built from the
embedded config, so inference can rebuild the renderer from the checkpoint
alone (reference: inference.py:33-72). Unlike the reference, --resume is
actually wired into the training CLIs.

backend="orbax" writes checkpoint_{iter:07d}.orbax/ directories through
orbax.checkpoint (sharded-array aware, multi-host coordinated) with the
same latest/best convention via symlinks and an embedded meta.json;
find_checkpoint/load_checkpoint_raw handle both formats transparently, so
--resume and inference work regardless of which backend wrote the run.

backend="orbax_async" serializes in a background thread
(orbax AsyncCheckpointer): save_checkpoint returns as soon as the arrays
are snapshotted, training overlaps the disk write, and the NEXT save (or
finalize_checkpoints(), which orchestrators call at run end) completes the
previous one — meta.json and the latest/best pointers are only written
after the data is durably committed, so a crash mid-write never leaves a
pointer at a half-written checkpoint.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def ckpt_needs_all_processes(backend: str) -> bool:
    """orbax Checkpointer.save runs multihost sync barriers when
    process_count > 1, so for those backends EVERY process must call
    save_checkpoint (a primary-only call deadlocks the primary at the
    barrier). npz is a pure-local write and stays primary-only."""
    return backend in ("orbax", "orbax_async") and jax.process_count() > 1


def save_checkpoint(
    output_dir: Path,
    iteration: int,
    state_tree: Any,
    config_dict: Dict[str, Any],
    noise_config_dict: Optional[Dict[str, Any]] = None,
    metrics: Optional[Dict[str, Any]] = None,
    is_best: bool = False,
    extra_arrays: Optional[Dict[str, np.ndarray]] = None,
    backend: str = "npz",
) -> Path:
    """Write checkpoint_{iter:07d}.npz + checkpoint_latest.npz
    (+ checkpoint_best.npz when is_best). backend="orbax" writes
    .orbax/ directories with the same naming convention."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    if backend in ("orbax", "orbax_async"):
        return _save_orbax(
            output_dir, iteration, state_tree, config_dict,
            noise_config_dict, metrics, is_best, extra_arrays,
            async_save=(backend == "orbax_async"),
        )

    leaves, _ = _flatten(state_tree)
    payload = {f"leaf_{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    if extra_arrays:
        for k, v in extra_arrays.items():
            payload[f"extra_{k}"] = np.asarray(v)
    meta = {
        "iteration": int(iteration),
        "num_leaves": len(leaves),
        "config": config_dict,
        "noise_config": noise_config_dict,
        "metrics": metrics or {},
        "format": "robust_nerf_tpu.npz.v1",
    }
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )

    path = output_dir / f"checkpoint_{iteration:07d}.npz"
    np.savez(path, **payload)
    # serialize ONCE; latest/best are byte copies of the file just written
    # (reference keeps them as independent full files — same on-disk
    # contract, a third of the serialization cost)
    shutil.copyfile(path, output_dir / "checkpoint_latest.npz")
    if is_best:
        shutil.copyfile(path, output_dir / "checkpoint_best.npz")
    return path


def _meta_dict(iteration, leaves, config_dict, noise_config_dict, metrics,
               fmt: str) -> Dict[str, Any]:
    return {
        "iteration": int(iteration),
        "num_leaves": len(leaves),
        "config": config_dict,
        "noise_config": noise_config_dict,
        "metrics": metrics or {},
        "format": fmt,
    }


def _update_pointer(link: Path, target: Path):
    """Point checkpoint_latest/.best at the newest .orbax dir (symlink)."""
    if link.is_symlink() or link.exists():
        link.unlink()
    link.symlink_to(target.name)


# In-flight async save: at most ONE pending write; the finalize step (wait,
# then write meta.json + move latest/best pointers) runs before the next
# save or at finalize_checkpoints().
_ASYNC: Dict[str, Any] = {"ckptr": None, "pending": None}


def _async_checkpointer():
    import orbax.checkpoint as ocp

    if _ASYNC["ckptr"] is None:
        _ASYNC["ckptr"] = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC["ckptr"]


def _finalize_step(path: Path, meta: Dict[str, Any], is_best: bool,
                   output_dir: Path):
    # pointer/meta publication is a plain filesystem write: one writer
    # (multihost: every process calls save for the barriers, but only the
    # primary owns the meta.json + latest/best pointers)
    if jax.process_index() != 0:
        return
    with open(path / "meta.json", "w") as f:
        json.dump(meta, f)
    _update_pointer(Path(output_dir) / "checkpoint_latest.orbax", path)
    if is_best:
        _update_pointer(Path(output_dir) / "checkpoint_best.orbax", path)


def finalize_checkpoints():
    """Complete any in-flight async checkpoint write (wait for the data
    commit, then publish meta.json + latest/best pointers). Orchestrators
    call this at the end of a run; a no-op for sync backends."""
    if _ASYNC["pending"] is None:
        return
    _ASYNC["ckptr"].wait_until_finished()
    _finalize_step(*_ASYNC["pending"])
    _ASYNC["pending"] = None


def _save_orbax(output_dir, iteration, state_tree, config_dict,
                noise_config_dict, metrics, is_best, extra_arrays,
                async_save: bool = False) -> Path:
    import orbax.checkpoint as ocp

    leaves, _ = _flatten(state_tree)
    payload: Dict[str, Any] = {
        "leaves": {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    }
    if extra_arrays:
        payload["extra"] = {k: np.asarray(v) for k, v in extra_arrays.items()}

    path = (Path(output_dir) / f"checkpoint_{iteration:07d}.orbax").resolve()
    meta = _meta_dict(iteration, leaves, config_dict, noise_config_dict,
                      metrics, "robust_nerf_tpu.orbax.v1")

    if async_save:
        finalize_checkpoints()               # complete the previous write
        _async_checkpointer().save(path, payload, force=True)
        _ASYNC["pending"] = (path, meta, is_best, Path(output_dir))
        return path

    ocp.PyTreeCheckpointer().save(path, payload, force=True)
    _finalize_step(path, meta, is_best, Path(output_dir))
    return path


def _load_orbax(path: Path) -> Tuple[list, Dict[str, Any], Dict[str, np.ndarray]]:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with open(path / "meta.json") as f:
        meta = json.load(f)
    restored = ocp.PyTreeCheckpointer().restore(path)
    leaf_map = restored["leaves"]
    leaves = [leaf_map[f"leaf_{i:05d}"] for i in range(meta["num_leaves"])]
    extra = dict(restored.get("extra") or {})
    return leaves, meta, extra


def load_checkpoint_raw(path: Path) -> Tuple[list, Dict[str, Any], Dict[str, np.ndarray]]:
    """Load leaves + metadata + extra arrays without needing a template.
    Accepts both .npz files and .orbax directories."""
    path = Path(path)
    if path.is_dir():
        return _load_orbax(path)
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(bytes(data["meta_json"].tobytes()).decode("utf-8"))
        leaves = [data[f"leaf_{i:05d}"] for i in range(meta["num_leaves"])]
        extra = {
            k[len("extra_"):]: data[k] for k in data.files if k.startswith("extra_")
        }
    return leaves, meta, extra


def restore_into(template_tree: Any, leaves: list) -> Any:
    """Unflatten loaded leaves into the structure of a freshly-built state."""
    t_leaves, treedef = _flatten(template_tree)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"Checkpoint has {len(leaves)} leaves but template expects "
            f"{len(t_leaves)} — config mismatch?"
        )
    cast = [
        np.asarray(l, dtype=np.asarray(t).dtype).reshape(np.asarray(t).shape)
        for l, t in zip(leaves, t_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, cast)


def find_checkpoint(path_or_dir: Path) -> Path:
    """Accept a checkpoint file/.orbax dir or an experiment dir
    (-> checkpoint_latest of either backend)."""
    p = Path(path_or_dir)
    if p.is_dir() and not (p / "meta.json").exists():
        for name in ("checkpoint_latest.npz", "checkpoint_latest.orbax"):
            cand = p / name
            if cand.exists():
                return cand
        raise FileNotFoundError(f"No checkpoint_latest.{{npz,orbax}} in {p}")
    return p
