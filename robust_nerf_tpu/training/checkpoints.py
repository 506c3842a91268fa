"""Checkpointing — npz pytree snapshots with the reference's naming scheme.

Reference layout (noisy_src/train.py:236-304): checkpoint_{iter:07d},
checkpoint_latest, checkpoint_best (by val PSNR), each containing model +
optimizer state + full config + noise config + metrics. Here a checkpoint
is one .npz holding every pytree leaf (flattened, order-stable) plus a JSON
metadata blob; restore unflattens into a template state built from the
embedded config, so inference can rebuild the renderer from the checkpoint
alone (reference: inference.py:33-72). Unlike the reference, --resume is
actually wired into the training CLIs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(
    output_dir: Path,
    iteration: int,
    state_tree: Any,
    config_dict: Dict[str, Any],
    noise_config_dict: Optional[Dict[str, Any]] = None,
    metrics: Optional[Dict[str, Any]] = None,
    is_best: bool = False,
    extra_arrays: Optional[Dict[str, np.ndarray]] = None,
) -> Path:
    """Write checkpoint_{iter:07d}.npz + checkpoint_latest.npz
    (+ checkpoint_best.npz when is_best)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

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
    latest = output_dir / "checkpoint_latest.npz"
    np.savez(latest, **payload)
    if is_best:
        np.savez(output_dir / "checkpoint_best.npz", **payload)
    return path


def load_checkpoint_raw(path: Path) -> Tuple[list, Dict[str, Any], Dict[str, np.ndarray]]:
    """Load leaves + metadata + extra arrays without needing a template."""
    with np.load(Path(path), allow_pickle=False) as data:
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
    """Accept a checkpoint file or an experiment dir (-> checkpoint_latest)."""
    p = Path(path_or_dir)
    if p.is_dir():
        cand = p / "checkpoint_latest.npz"
        if not cand.exists():
            raise FileNotFoundError(f"No checkpoint_latest.npz in {p}")
        return cand
    return p
