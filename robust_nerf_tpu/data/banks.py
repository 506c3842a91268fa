"""Device-resident ray and pixel banks.

The reference precomputes rays on the host and samples batches with
torch.randint in Python (noisy_src/data.py:161-321, data_pose_opt.py:21-244).
Here the banks are device arrays (pytrees) and batch *sampling happens
inside the jitted train step* via jax.random — the whole step, including
the gather, is one XLA program with zero host<->device traffic.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .blender import SceneData
from ..core.rays import get_ray_directions, get_rays_batch
from ..core.noise import NoiseConfig, add_noise_to_poses
from ..parallel.mesh import DATA_AXIS


class RayBank(NamedTuple):
    """All rays of all training images, flattened (reference: RayDataset,
    noisy_src/data.py:161-262). Used by the fixed-pose training path."""

    rays_o: jnp.ndarray   # (M, 3)
    rays_d: jnp.ndarray   # (M, 3)
    rgb: jnp.ndarray      # (M, 3)


class PixelBank(NamedTuple):
    """Pixel-level bank for pose optimization (reference: PixelDataset,
    noisy_src/data_pose_opt.py:29-81). Rays are regenerated per step from
    the *current* pose estimates, so only pixel coords + targets are stored."""

    image_indices: jnp.ndarray   # (M,) int32
    us: jnp.ndarray              # (M,) int32 — pixel column
    vs: jnp.ndarray              # (M,) int32 — pixel row
    rgb: jnp.ndarray             # (M, 3)
    directions: jnp.ndarray      # (H, W, 3) camera-frame direction grid


def build_ray_bank(
    scene: SceneData,
    noise_config: Optional[NoiseConfig] = None,
) -> Tuple[RayBank, np.ndarray, list]:
    """Precompute every ray of every image, optionally noising poses first.

    Reference semantics: noisy_src/data.py:202-243 (noise applied to poses
    before ray precompute), but ray generation is one vmapped device op
    instead of a per-image Python loop.

    Returns (bank, poses_used (N,4,4) numpy, noise_infos).
    """
    poses = np.asarray(scene.poses, dtype=np.float32)
    noise_infos: list = []
    if noise_config is not None and noise_config.has_noise:
        poses, noise_infos = add_noise_to_poses(poses, noise_config)

    rays_o, rays_d = get_rays_batch(
        scene.H, scene.W, scene.focal, jnp.asarray(poses)
    )  # (N, H, W, 3) each
    bank = RayBank(
        rays_o=rays_o.reshape(-1, 3),
        rays_d=rays_d.reshape(-1, 3),
        rgb=jnp.asarray(scene.images, jnp.float32).reshape(-1, 3),
    )
    return bank, poses, noise_infos


def build_pixel_bank(scene: SceneData) -> PixelBank:
    """Pixel bank for pose-opt: coords + targets + shared direction grid.

    Reference semantics: noisy_src/data_pose_opt.py:29-81, vectorized.
    """
    N, H, W = scene.images.shape[:3]
    flat = np.arange(N * H * W, dtype=np.int32)
    return PixelBank(
        image_indices=jnp.asarray(flat // (H * W)),
        us=jnp.asarray(flat % W),
        vs=jnp.asarray((flat % (H * W)) // W),
        rgb=jnp.asarray(scene.images, jnp.float32).reshape(-1, 3),
        directions=get_ray_directions(H, W, scene.focal),
    )


def sample_ray_batch(bank: RayBank, key: jax.Array, batch_size: int):
    """Random-with-replacement ray batch (reference: RaySampler.sample_batch,
    noisy_src/data.py:297-309). Pure; safe to call inside jit/scan."""
    idx = jax.random.randint(key, (batch_size,), 0, bank.rgb.shape[0])
    return {
        "rays_o": bank.rays_o[idx],
        "rays_d": bank.rays_d[idx],
        "target_rgb": bank.rgb[idx],
    }


def shard_bank(bank, mesh):
    """Place a bank SPLIT along the mesh's data axis instead of replicated.

    For very large scenes the replicated bank dominates HBM (~576 MB at
    100x800x800 frames); splitting it makes bank memory scale 1/D per chip.
    Flat (M, ...) leaves are padded to a multiple of the mesh size with
    wraparound rows (duplicates get a <=D/M relative oversampling bias —
    negligible at real bank sizes) and sharded P('data'); the PixelBank's
    (H, W, 3) direction grid stays replicated. Use with the
    `make_sharded_*_sampler` samplers (TPUConfig.shard_bank=True).
    """
    n_dev = int(np.prod(mesh.devices.shape))
    split = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def place(x, is_flat):
        if not is_flat:
            return jax.device_put(x, repl)
        m = x.shape[0]
        pad = (-m) % n_dev
        if pad:
            x = jnp.concatenate([x, x[:pad]], axis=0)
        return jax.device_put(x, split)

    if isinstance(bank, RayBank):
        return RayBank(*(place(x, True) for x in bank))
    if isinstance(bank, PixelBank):
        return PixelBank(
            image_indices=place(bank.image_indices, True),
            us=place(bank.us, True),
            vs=place(bank.vs, True),
            rgb=place(bank.rgb, True),
            directions=place(bank.directions, False),
        )
    raise TypeError(f"not a bank: {type(bank)}")


def make_sharded_ray_sampler(mesh, batch_size: int):
    """Per-device batch sampling from a split RayBank (see `shard_bank`).

    Each device draws batch_size/D rays uniformly-with-replacement from its
    LOCAL bank shard — a stratified-over-shards variant of the reference's
    global uniform sampling (noisy_src/data.py:297-309): the marginal
    per-ray probability is identical, with exactly batch_size/D draws per
    shard instead of a binomial split. The gather never leaves the device;
    the returned batch is sharded P('data') on its leading axis.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} % mesh size {n_dev} != 0")
    per_dev = batch_size // n_dev

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
    )
    def sample(rays_o, rays_d, rgb, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        idx = jax.random.randint(key, (per_dev,), 0, rgb.shape[0])
        return {
            "rays_o": rays_o[idx],
            "rays_d": rays_d[idx],
            "target_rgb": rgb[idx],
        }

    return lambda bank, key: sample(bank.rays_o, bank.rays_d, bank.rgb, key)


def make_sharded_pixel_sampler(mesh, batch_size: int):
    """Per-device pixel-batch sampling from a split PixelBank.

    Same stratified-over-shards semantics as `make_sharded_ray_sampler`.
    Because rays are ordered by image, each device holds (and samples) a
    contiguous block of images; per-image pose gradients therefore originate
    on one device and reduce through the same psum as the MLP grads.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} % mesh size {n_dev} != 0")
    per_dev = batch_size // n_dev

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
    )
    def sample(image_indices, us, vs, rgb, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        idx = jax.random.randint(key, (per_dev,), 0, rgb.shape[0])
        return {
            "image_indices": image_indices[idx],
            "us": us[idx],
            "vs": vs[idx],
            "target_rgb": rgb[idx],
        }

    return lambda bank, key: sample(
        bank.image_indices, bank.us, bank.vs, bank.rgb, key
    )


def sample_pixel_batch(bank: PixelBank, key: jax.Array, batch_size: int):
    """Random pixel batch for pose-opt (reference: PixelSampler.sample_batch,
    noisy_src/data_pose_opt.py:178-198). Rays are regenerated by the caller
    from current pose estimates — that is the differentiable path."""
    idx = jax.random.randint(key, (batch_size,), 0, bank.rgb.shape[0])
    return {
        "image_indices": bank.image_indices[idx],
        "us": bank.us[idx],
        "vs": bank.vs[idx],
        "target_rgb": bank.rgb[idx],
    }
