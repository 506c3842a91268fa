"""Reference-named compatibility wrappers.

The reference exposes torch-style Dataset/Sampler/Module classes
(noisy_src/__init__.py:10-23). The TPU framework is functional — banks are
device-array pytrees and sampling happens inside the jitted step — but
users migrating from the reference can keep their class names: these
wrappers provide the same construction surface and batch-iteration
behavior on top of the functional core.
"""

from __future__ import annotations

from dataclasses import dataclass
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

    def sample_batch(self) -> "PixelBatch":
        self._key, sub = jax.random.split(self._key)
        return PixelBatch.from_bank_batch(
            sample_pixel_batch(self.dataset.bank, sub, self.batch_size)
        )


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


@jax.tree_util.register_pytree_node_class
@dataclass
class PixelBatch:
    """Batch of pixel coordinates + targets
    (reference: noisy_src/data_pose_opt.py:21-26).

    Attribute access matches the reference (`image_indices`,
    `pixel_coords` as (B, 2) (u, v), `target_rgb`); dict-style access
    additionally accepts this framework's bank keys (`us`, `vs`).
    Registered as a JAX pytree (three array leaves) so tree_map/jit/
    device_put treat it like the dict it replaced.
    """

    image_indices: object   # (B,)
    pixel_coords: object    # (B, 2) — (u, v)
    target_rgb: object      # (B, 3)

    @classmethod
    def from_bank_batch(cls, batch: dict) -> "PixelBatch":
        import jax.numpy as jnp

        return cls(
            image_indices=batch["image_indices"],
            pixel_coords=jnp.stack([batch["us"], batch["vs"]], axis=-1),
            target_rgb=batch["target_rgb"],
        )

    def tree_flatten(self):
        return (self.image_indices, self.pixel_coords, self.target_rgb), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)

    def __getitem__(self, key):
        if key == "us":
            return self.pixel_coords[:, 0]
        if key == "vs":
            return self.pixel_coords[:, 1]
        if isinstance(key, str) and key in (
            "image_indices", "pixel_coords", "target_rgb"
        ):
            return getattr(self, key)
        raise KeyError(key)


class CameraPoseParameters:
    """Learnable SE(3) camera deltas with the reference's class surface
    (noisy_src/train_pose_opt.py:53-271).

    The TPU framework keeps pose deltas as a plain pytree inside
    PoseOptState (training/steps.py) — this wrapper provides the
    reference's object API (get_poses / get_all_poses /
    compute_pose_errors, learn_* freezing) on top of the same functional
    SE(3) core, for users porting reference training scripts.
    """

    def __init__(self, initial_poses, learn_rotation: bool = True,
                 learn_translation: bool = True):
        import jax.numpy as jnp

        self.initial_poses = jnp.asarray(initial_poses, jnp.float32)
        self.n_poses = int(self.initial_poses.shape[0])
        self.learn_rotation = learn_rotation
        self.learn_translation = learn_translation
        self.rotation_deltas = jnp.zeros((self.n_poses, 3), jnp.float32)
        self.translation_deltas = jnp.zeros((self.n_poses, 3), jnp.float32)

    @property
    def pose_params(self) -> dict:
        """The functional pytree the jitted steps optimize."""
        return {
            "rotation_deltas": self.rotation_deltas,
            "translation_deltas": self.translation_deltas,
        }

    def load_pose_params(self, pose_params: dict) -> None:
        """Adopt deltas from a PoseOptState (e.g. after training)."""
        self.rotation_deltas = pose_params["rotation_deltas"]
        self.translation_deltas = pose_params["translation_deltas"]

    def get_poses(self, indices=None):
        """Current poses = exp-map deltas composed onto the initial poses
        (reference: train_pose_opt.py:186-226), honoring learn_* freezes."""
        import jax.numpy as jnp

        from robust_nerf_tpu.core.se3 import apply_pose_deltas

        rot = self.rotation_deltas if self.learn_rotation else (
            jnp.zeros_like(self.rotation_deltas))
        trans = self.translation_deltas if self.learn_translation else (
            jnp.zeros_like(self.translation_deltas))
        poses = apply_pose_deltas(self.initial_poses, rot, trans)
        if indices is not None:
            poses = poses[jnp.asarray(indices)]
        return poses

    def get_all_poses(self):
        return self.get_poses()

    def compute_pose_errors(self, ground_truth_poses, indices=None) -> dict:
        """Error stats vs ground truth with the reference's key names
        (train_pose_opt.py:232-271)."""
        import jax.numpy as jnp

        from robust_nerf_tpu.core.se3 import pose_errors

        current = self.get_poses(indices)
        gt = jnp.asarray(ground_truth_poses, jnp.float32)
        if indices is not None:
            gt = gt[jnp.asarray(indices)]
        e = pose_errors(current, gt)
        return {
            "rotation_error_mean": float(e["mean_rotation_error_deg"]),
            "rotation_error_std": float(e["std_rotation_error_deg"]),
            "rotation_error_max": float(e["max_rotation_error_deg"]),
            "translation_error_mean": float(e["mean_translation_error"]),
            "translation_error_std": float(e["std_translation_error"]),
            "translation_error_max": float(e["max_translation_error"]),
        }


def set_seed(seed: int) -> None:
    """Host-side RNG seeding (reference: train.py:36-42 seeds
    random/numpy/torch/cuda). Device-side randomness in this framework is
    explicit jax.random key threading (seeded from TrainConfig.seed), so
    only the host streams are global state — including the noise module's
    default Generator (in the reference, noise consumes the numpy global
    stream, so set_seed made it reproducible; mirror that here)."""
    import random as _random

    from robust_nerf_tpu.core.noise import set_noise_seed

    _random.seed(seed)
    set_noise_seed(seed)   # also does np.random.seed(seed)


def render_image(renderer: NeRFRenderer, pose, H: int, W: int, focal: float,
                 chunk_size: int = 1024 * 4):
    """Full-frame render with the reference's signature
    (noisy_src/inference.py:76-105 / train.py:122-160): takes the
    renderer OBJECT + camera intrinsics, returns {"rgb", "depth", "acc"}
    maps of shape (H, W, ...)."""
    from robust_nerf_tpu.config import TPUConfig
    from robust_nerf_tpu.ops.rendering import render_image as _render_image

    tpu_cfg = TPUConfig(eval_tile=int(chunk_size))
    out = _render_image(
        renderer.models, np.asarray(pose), H, W, focal,
        renderer.config, renderer.model_coarse.config, tpu_cfg,
    )
    return out


def generate_output_folder_name(mode: str, noise_config, scene: str) -> str:
    """{mode}_{scene}_{noise_desc}_{timestamp}
    (reference: inference.py:128-142)."""
    from datetime import datetime

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    return f"{mode}_{scene}_{noise_config}_{timestamp}"


_STEP_CACHE: dict = {}


def _copy_state(state):
    """The production chunks donate their input state buffers (jit
    donate_argnums) — correct for the training loops, surprising for this
    single-step compat API where the reference leaves the caller's
    objects usable. Donate a fresh copy instead so `state` stays valid
    after the call."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.array, state)


def _cached_chunk(cfg, kind: str):
    """One-iteration jitted step builder, cached per config contents."""
    import json as _json

    from robust_nerf_tpu.config import config_to_dict
    from robust_nerf_tpu.training.steps import (
        make_pose_opt_chunk,
        make_train_chunk,
    )

    key = (kind, _json.dumps(config_to_dict(cfg), sort_keys=True, default=str))
    if key not in _STEP_CACHE:
        build = make_train_chunk if kind == "train" else make_pose_opt_chunk
        _STEP_CACHE[key] = build(cfg, steps=1)
    return _STEP_CACHE[key]


def train_step(state, bank, key, cfg):
    """ONE optimization step (reference: train.py:68-119, whose train_step
    renders a batch, backprops, clips, and applies Adam).

    Functional equivalent: samples a batch from `bank`, runs the fused
    render+loss+backward+update program, returns (new_state, metrics) with
    scalar metrics (loss/loss_coarse/loss_fine/psnr/learning_rate). For
    production loops prefer make_train_chunk (many steps per dispatch).
    """
    chunk = _cached_chunk(cfg, "train")
    state, m = chunk(_copy_state(state), bank, key)
    return state, {k: float(np.asarray(v)[0]) for k, v in m.items()}


def train_step_with_poses(state, bank, key, cfg):
    """ONE joint NeRF+pose step (reference: train_pose_opt.py:290-409).

    Same contract as `train_step`, on a PoseOptState + PixelBank; pose
    gradients flow through differentiable ray regeneration and the delayed
    pose optimizer exactly as in the production loop."""
    chunk = _cached_chunk(cfg, "pose_opt")
    state, m = chunk(_copy_state(state), bank, key)
    return state, {k: float(np.asarray(v)[0]) for k, v in m.items()}


def render_image_with_pose(model_coarse, model_fine, pose, H, W, focal,
                           render_config=None, chunk_size: int = 1024 * 4,
                           model_config=None):
    """Full-frame render from explicit coarse/fine models + pose
    (reference: train_pose_opt.py:414-470). Each model may independently
    be a compat.NeRF wrapper or a raw param pytree; `model_config` pins
    the architecture for raw pytrees (defaults to the first wrapper's
    config, else ModelConfig() — pass it explicitly for non-default
    architectures given as raw params)."""
    from robust_nerf_tpu.config import TPUConfig
    from robust_nerf_tpu.ops.rendering import render_image as _render_image

    def split(m):
        return (m.params, m.config) if isinstance(m, NeRF) else (m, None)

    coarse_params, coarse_cfg = split(model_coarse)
    models = {"coarse": coarse_params}
    fine_cfg = None
    if model_fine is not None:
        models["fine"], fine_cfg = split(model_fine)
    model_cfg = model_config or coarse_cfg or fine_cfg or ModelConfig()
    return _render_image(
        models, np.asarray(pose), H, W, focal,
        render_config or RenderConfig(), model_cfg,
        TPUConfig(eval_tile=int(chunk_size)),
    )
