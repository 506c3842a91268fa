"""Reference-named compatibility wrappers.

The reference exposes torch-style Dataset/Sampler/Module classes
(noisy_src/__init__.py:10-23). The TPU framework is functional — banks are
device-array pytrees and sampling happens inside the jitted step — but
users migrating from the reference can keep their class names: these
wrappers provide the same construction surface and batch-iteration
behavior on top of the functional core.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from robust_nerf_tpu.config import ModelConfig, RenderConfig
from robust_nerf_tpu.core.noise import NoiseConfig
from robust_nerf_tpu.data.banks import (
    build_pixel_bank,
    build_ray_bank,
    sample_pixel_batch,
    sample_ray_batch,
)
from robust_nerf_tpu.data.synthetic import load_scene
from robust_nerf_tpu.models.nerf import create_nerf as _create_models
from robust_nerf_tpu.models.nerf import init_nerf_params, nerf_apply, posenc_output_dim
from robust_nerf_tpu.ops.rendering import render_rays, render_rays_chunked


class PositionalEncoding:
    """Callable frequency encoder (reference: noisy_src/model.py:20-80)."""

    def __init__(self, num_freqs: int, include_input: bool = True,
                 log_sampling: bool = True):
        if not log_sampling:
            raise NotImplementedError(
                "linear frequency sampling is not used by any reference "
                "config; only log-spaced bands are supported"
            )
        self.num_freqs = num_freqs
        self.include_input = include_input

    @property
    def output_dim(self) -> int:
        return posenc_output_dim(self.num_freqs, self.include_input)

    def __call__(self, x):
        from robust_nerf_tpu.models.nerf import positional_encoding

        return positional_encoding(x, self.num_freqs, self.include_input)


class NeRF:
    """Callable NeRF model wrapper (reference: noisy_src/model.py:83-196).

    Holds a params pytree; `model(x, d)` -> (rgb, sigma).
    """

    def __init__(self, config: Optional[ModelConfig] = None,
                 key: Optional[jax.Array] = None, params=None):
        self.config = config or ModelConfig()
        if params is not None:
            self.params = params
        else:
            self.params = init_nerf_params(
                key if key is not None else jax.random.PRNGKey(0), self.config
            )

    def __call__(self, x, d=None):
        return nerf_apply(self.params, x, d, self.config)


class NeRFRenderer:
    """Chunked renderer wrapper (reference: noisy_src/rendering.py:243-323)."""

    def __init__(self, model_coarse: NeRF, model_fine: Optional[NeRF],
                 config: Optional[RenderConfig] = None):
        self.model_coarse = model_coarse
        self.model_fine = model_fine
        self.config = config or RenderConfig()

    @property
    def models(self):
        m = {"coarse": self.model_coarse.params}
        if self.model_fine is not None:
            m["fine"] = self.model_fine.params
        return m

    def __call__(self, rays_o, rays_d, chunk_size: int = 1024 * 32,
                 is_train: bool = True, key=None):
        out = render_rays_chunked(
            self.models, rays_o, rays_d, key, self.config,
            self.model_coarse.config, is_train=is_train, tile=chunk_size,
        )
        # reference key names
        return out


class RayDataset:
    """Precomputed-ray dataset (reference: noisy_src/data.py:161-262)."""

    def __init__(self, data, noise_config: Optional[NoiseConfig] = None):
        self.bank, self.poses_used, self.noise_info = build_ray_bank(
            data, noise_config
        )
        self.n_rays = int(self.bank.rgb.shape[0])

    def __len__(self):
        return self.n_rays


class RaySampler:
    """Random ray-batch sampler + epoch iterator
    (reference: noisy_src/data.py:264-321).

    `sample_batch()` draws with replacement (the training loops' path);
    iterating walks ONE shuffled epoch in batch_size slices — the last
    batch may be partial — then raises StopIteration, and `len(sampler)`
    is ceil(n_rays / batch_size), exactly like the reference.
    """

    def __init__(self, dataset: RayDataset, batch_size: int = 1024,
                 shuffle: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.n_rays = dataset.n_rays
        self._key = jax.random.PRNGKey(seed)
        self._reset_indices()

    def _reset_indices(self):
        if self.shuffle:
            self._key, sub = jax.random.split(self._key)
            self._indices = jax.random.permutation(sub, self.n_rays)
        else:
            import jax.numpy as jnp

            self._indices = jnp.arange(self.n_rays)
        self._current = 0

    def sample_batch(self):
        self._key, sub = jax.random.split(self._key)
        return sample_ray_batch(self.dataset.bank, sub, self.batch_size)

    def __iter__(self):
        self._reset_indices()
        return self

    def __next__(self):
        if self._current >= self.n_rays:
            raise StopIteration
        end = min(self._current + self.batch_size, self.n_rays)
        idx = self._indices[self._current:end]
        self._current = end
        bank = self.dataset.bank
        return {
            "rays_o": bank.rays_o[idx],
            "rays_d": bank.rays_d[idx],
            "target_rgb": bank.rgb[idx],
        }

    def __len__(self) -> int:
        return (self.n_rays + self.batch_size - 1) // self.batch_size


class PixelDataset:
    """Pixel-coordinate dataset for pose-opt
    (reference: noisy_src/data_pose_opt.py:29-81)."""

    def __init__(self, data):
        self.bank = build_pixel_bank(data)
        self.H, self.W = int(data.H), int(data.W)
        self.n_pixels = int(self.bank.rgb.shape[0])

    def __len__(self):
        return self.n_pixels


class PixelSampler:
    """Random pixel-batch iterator
    (reference: noisy_src/data_pose_opt.py:151-198)."""

    def __init__(self, dataset: PixelDataset, batch_size: int = 1024, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self._key = jax.random.PRNGKey(seed)

    def sample_batch(self):
        self._key, sub = jax.random.split(self._key)
        return sample_pixel_batch(self.dataset.bank, sub, self.batch_size)


def create_data_loaders(config, noise_config: Optional[NoiseConfig] = None,
                        seed: int = 0):
    """(train RaySampler, val SceneData) — train poses optionally noised,
    val clean (reference: noisy_src/data.py:324-385)."""
    train_scene = load_scene(config, "train")
    val_scene = load_scene(config, "val")
    dataset = RayDataset(train_scene, noise_config)
    sampler = RaySampler(dataset, batch_size=config.batch_size, seed=seed)
    return sampler, val_scene


def create_pixel_dataset(config, seed: int = 0):
    """(PixelSampler, train SceneData, val SceneData)
    (reference: noisy_src/data_pose_opt.py:226-244)."""
    train_scene = load_scene(config, "train")
    val_scene = load_scene(config, "val")
    dataset = PixelDataset(train_scene)
    sampler = PixelSampler(dataset, batch_size=config.batch_size, seed=seed)
    return sampler, train_scene, val_scene
