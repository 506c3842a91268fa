"""Device mesh + sharding helpers — the framework's distributed backend.

The reference has no distributed layer at all (single GPU, SURVEY.md §5.8).
The TPU-native equivalent: a 1-D `data` mesh over all chips, the ray batch
sharded along it, parameters (including per-image pose deltas) replicated.
Gradients — MLP *and* pose — reduce over ICI automatically: with
replicated-param / sharded-batch jit, XLA inserts the psum. Host-side
logging/checkpointing is guarded by `is_primary_host()`.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh. num_devices=0 -> all visible devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-ray/per-pixel batch arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a batch pytree with its leading axis split across the mesh."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def constrain_batch(tree, mesh: Optional[Mesh]):
    """Inside-jit hint: batch leaves are split along the data axis. XLA then
    shards the whole render/backward along rays and all-reduces the grads."""
    if mesh is None or np.prod(mesh.devices.shape) <= 1:
        return tree
    s = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, s), tree
    )


def is_primary_host() -> bool:
    """True on the process that should write logs/checkpoints
    (multi-host pods have one writer; reference is single-process)."""
    return jax.process_index() == 0


def sync_string(s: str, max_len: int = 256) -> str:
    """Broadcast a string from process 0 to all processes.

    Experiment names embed a wall-clock timestamp
    (training.train.generate_experiment_name) which can differ across
    hosts; multihost-coordinated checkpoint writes (orbax) need every
    process to agree on the output path.

    Strings longer than max_len UTF-8 bytes are truncated on a
    character boundary — identically on single- and multi-process, so
    the same config yields the same output dir either way."""
    raw = s.encode("utf-8")
    if len(raw) > max_len:
        # Back off to a UTF-8 boundary so decode() can't see a split
        # multi-byte character.
        s = raw[:max_len].decode("utf-8", errors="ignore")
        raw = s.encode("utf-8")
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out).rstrip(b"\x00").decode("utf-8")


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m
