"""Procedural analytic scene — dataset-free ground truth for tests/benches.

The reference assumes the NeRF-synthetic dataset on disk. This module
generates an equivalent SceneData by *exactly* volume-rendering an analytic
radiance field (a handful of colored Gaussian density blobs) with dense
deterministic sampling through the same raw2outputs compositor the models
train against. Because the GT comes from the true volume-rendering
equation, a NeRF trained on these images converges toward it and pose
optimization has a well-defined optimum — so convergence and pose-recovery
tests run hermetically on any backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .blender import SceneData
from ..core.rays import get_ray_directions, get_rays

# Blob layout: centers inside the unit ball, camera ring at radius 4 —
# consistent with the reference lego defaults near=2 / far=6.
_BLOB_CENTERS = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.7, 0.0, 0.2],
        [-0.5, 0.5, -0.3],
        [0.0, -0.7, 0.4],
        [-0.3, -0.3, -0.5],
    ],
    dtype=np.float32,
)
_BLOB_RADII = np.array([0.45, 0.25, 0.3, 0.22, 0.28], dtype=np.float32)
_BLOB_DENSITY = np.array([18.0, 22.0, 20.0, 25.0, 21.0], dtype=np.float32)
_BLOB_COLORS = np.array(
    [
        [0.9, 0.2, 0.2],
        [0.2, 0.8, 0.3],
        [0.25, 0.35, 0.95],
        [0.95, 0.85, 0.2],
        [0.8, 0.3, 0.9],
    ],
    dtype=np.float32,
)
_CLASSIC_TEX_FREQS = np.array([9.0, 11.0, 10.0], dtype=np.float32)
_CLASSIC_TEX_PHASES = np.zeros(3, dtype=np.float32)

# Names that resolve to the handcrafted scene above (kept bit-identical so
# every existing test/bench golden stays valid). "lego" because the config
# default scene_name is lego (config.py DataConfig) and the synthetic source
# stands in for it when the Blender set is absent.
_CLASSIC_NAMES = frozenset({"", "lego", "synthetic", "blobs"})

# The 8-scene procedural family — the dataset-free analog of the 8 Blender
# synthetic scenes for sweep_scenes.py (SURVEY.md §7 item 14; the real set
# cannot be downloaded here). Each name deterministically seeds a distinct
# blob layout via scene_params(); any other string is also a valid scene.
SYNTHETIC_SCENES = (
    "blobs", "orbit", "stack", "spray", "shells", "arch", "twist", "crown",
)


def scene_params(scene_name: str = "blobs"):
    """Deterministic per-scene analytic-field parameters.

    Classic names return the handcrafted layout; any other name seeds a
    Generator (stable across runs/platforms via crc32) that samples 4-8
    Gaussian blobs inside the unit ball plus a texture frequency/phase
    triple, yielding a visually and geometrically distinct scene per name.
    """
    if scene_name in _CLASSIC_NAMES:
        return (
            _BLOB_CENTERS,
            _BLOB_RADII,
            _BLOB_DENSITY,
            _BLOB_COLORS,
            _CLASSIC_TEX_FREQS,
            _CLASSIC_TEX_PHASES,
        )
    import zlib

    rng = np.random.default_rng(zlib.crc32(scene_name.encode("utf-8")))
    k = int(rng.integers(4, 9))
    # Centers in a ball of radius 0.8 (rejection-free: scale by cbrt(u)).
    dirs = rng.normal(size=(k, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    centers = (dirs * 0.8 * np.cbrt(rng.uniform(size=(k, 1)))).astype(np.float32)
    radii = rng.uniform(0.18, 0.45, size=k).astype(np.float32)
    density = rng.uniform(15.0, 26.0, size=k).astype(np.float32)
    # Saturated, bright-ish albedos: one dominant channel per blob.
    colors = rng.uniform(0.15, 0.55, size=(k, 3)).astype(np.float32)
    colors[np.arange(k), rng.integers(0, 3, size=k)] = rng.uniform(
        0.75, 0.95, size=k
    ).astype(np.float32)
    tex_freqs = rng.uniform(6.0, 14.0, size=3).astype(np.float32)
    tex_phases = rng.uniform(0.0, 2 * np.pi, size=3).astype(np.float32)
    return centers, radii, density, colors, tex_freqs, tex_phases


def analytic_field(pts: jnp.ndarray, textured: bool = False, params=None):
    """Density + color of the analytic scene at world points (..., 3).

    Returns (rgb (..., 3), sigma (...,)). Smooth (Gaussian blobs), so a
    coarse MLP can fit it in a few hundred steps. `textured` modulates the
    albedo with a mid-frequency pattern — pose optimization benchmarks need
    texture gradients; smooth blobs underconstrain fine alignment.
    `params` selects a scene from the procedural family (scene_params());
    None keeps the classic handcrafted layout.
    """
    if params is None:
        params = scene_params()
    centers, radii, dens, colors, tex_freqs, tex_phases = (
        jnp.asarray(p) for p in params
    )

    d2 = jnp.sum((pts[..., None, :] - centers) ** 2, axis=-1)  # (..., K)
    # Compact support: subtract the 3-sigma tail so density is exactly zero
    # away from the blobs — keeps the background truly white and gives pose
    # optimization a clean silhouette signal.
    cutoff = jnp.exp(jnp.float32(-0.5 * 3.0**2))
    blob_sigma = dens * jnp.maximum(
        jnp.exp(-0.5 * d2 / (radii**2)) - cutoff, 0.0
    )                                                          # (..., K)
    sigma = jnp.sum(blob_sigma, axis=-1)
    w = blob_sigma / (jnp.sum(blob_sigma, axis=-1, keepdims=True) + 1e-8)
    rgb = jnp.einsum("...k,kc->...c", w, colors)
    if textured:
        tex = (
            0.7
            + 0.3
            * jnp.sin(tex_freqs[0] * pts[..., 0] + tex_phases[0])
            * jnp.sin(tex_freqs[1] * pts[..., 1] + tex_phases[1])
            * jnp.sin(tex_freqs[2] * pts[..., 2] + tex_phases[2])
        )
        rgb = jnp.clip(rgb * tex[..., None], 0.0, 1.0)
    return rgb, sigma


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Blender-style camera-to-world on a sphere looking at the origin
    (OpenGL convention: camera looks down its -Z)."""
    theta = np.deg2rad(theta_deg)
    phi = np.deg2rad(phi_deg)
    # Start at (0, 0, radius) looking down -Z toward the origin, then rotate.
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rot_phi = np.eye(4, dtype=np.float32)
    rot_phi[1, 1] = np.cos(phi)
    rot_phi[1, 2] = -np.sin(phi)
    rot_phi[2, 1] = np.sin(phi)
    rot_phi[2, 2] = np.cos(phi)
    rot_theta = np.eye(4, dtype=np.float32)
    rot_theta[0, 0] = np.cos(theta)
    rot_theta[0, 2] = np.sin(theta)
    rot_theta[2, 0] = -np.sin(theta)
    rot_theta[2, 2] = np.cos(theta)
    return rot_theta @ rot_phi @ trans


@partial(jax.jit, static_argnames=("H", "W", "full_H", "num_samples",
                                    "white_background", "textured"))
def _render_gt_rows(
    pose, row0, H: int, W: int, full_H: int, focal: float,
    near: float, far: float, num_samples: int, white_background: bool,
    textured: bool = False, params=None,
):
    """Exactly volume-render a (H, W) row block starting at pixel row row0
    of a full_H-tall frame."""
    from ..ops.rendering import raw2outputs

    directions = jax.lax.dynamic_slice_in_dim(
        get_ray_directions(full_H, W, focal), row0, H, axis=0
    )
    rays_o, rays_d = get_rays(directions, jnp.asarray(pose))
    t = jnp.linspace(0.0, 1.0, num_samples)
    z_vals = near * (1.0 - t) + far * t
    z_vals = jnp.broadcast_to(z_vals, (H, W, num_samples))
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., None]
    rgb, sigma = analytic_field(pts, textured=textured, params=params)
    out = raw2outputs(
        rgb, sigma, z_vals, rays_d, white_background=white_background
    )
    return out["rgb_map"]


# Row-block size cap so the GT render's (rows, W, S, K) blob-distance
# intermediate stays well under HBM scale at 800x800xS=256 (a full frame
# there is ~5 GB of transients). 128 rows x 800 x 256 x 8 blobs f32
# ≈ 840 MB peak — safe on the chip and on CPU hosts.
_GT_MAX_PIXELS_PER_BLOCK = 128 * 800


def _render_gt_image(
    pose, H: int, W: int, focal: float,
    near: float, far: float, num_samples: int, white_background: bool,
    textured: bool = False, params=None,
):
    rows_per_block = max(1, _GT_MAX_PIXELS_PER_BLOCK // max(W, 1))
    if H <= rows_per_block:
        return _render_gt_rows(
            pose, 0, H, W, H, focal, near, far, num_samples,
            white_background, textured, params,
        )
    # fixed-size blocks (one compile) + a remainder block
    blocks = []
    r = 0
    while r + rows_per_block <= H:
        blocks.append(np.asarray(_render_gt_rows(
            pose, r, rows_per_block, W, H, focal, near, far, num_samples,
            white_background, textured, params,
        )))
        r += rows_per_block
    if r < H:
        blocks.append(np.asarray(_render_gt_rows(
            pose, r, H - r, W, H, focal, near, far, num_samples,
            white_background, textured, params,
        )))
    return jnp.asarray(np.concatenate(blocks, axis=0))


def make_synthetic_scene(
    num_images: int = 20,
    resolution: int = 64,
    split: str = "train",
    radius: float = 4.0,
    num_samples: int = 256,
    white_background: bool = True,
    textured: bool = False,
    scene_name: str = "blobs",
) -> SceneData:
    """Generate a SceneData with exactly-rendered GT images.

    Splits use disjoint, deterministic camera angles so train/val don't
    alias. focal is chosen for a ~40 degree horizontal FOV. `scene_name`
    picks a member of the procedural family (SYNTHETIC_SCENES); the default
    is the classic handcrafted layout used by tests and benches.
    """
    H = W = resolution
    focal = 0.5 * W / np.tan(0.5 * np.deg2rad(40.0))
    params = scene_params(scene_name)

    offset = {"train": 0.0, "val": 7.0, "test": 13.0}.get(split, 0.0)
    thetas = np.linspace(0.0, 360.0, num_images, endpoint=False) + offset
    phis = -30.0 + 12.0 * np.sin(np.linspace(0.0, 2 * np.pi, num_images, endpoint=False) + offset)

    poses = np.stack(
        [pose_spherical(t, p, radius) for t, p in zip(thetas, phis)], axis=0
    )
    images = []
    for pose in poses:
        img = _render_gt_image(
            pose, H, W, float(focal), 2.0, 6.0, num_samples, white_background,
            textured, params,
        )
        images.append(np.asarray(img, dtype=np.float32))
    return SceneData(
        images=np.clip(np.stack(images, axis=0), 0.0, 1.0),
        poses=poses.astype(np.float32),
        H=H,
        W=W,
        focal=float(focal),
    )


def load_scene(data_cfg, split: str) -> SceneData:
    """Dispatch between on-disk Blender data and the procedural scene."""
    if data_cfg.source == "synthetic":
        num = (
            data_cfg.synthetic_num_train
            if split == "train"
            else data_cfg.synthetic_num_val
        )
        return make_synthetic_scene(
            num_images=num,
            resolution=data_cfg.synthetic_resolution,
            split=split,
            textured=getattr(data_cfg, "synthetic_textured", False),
            scene_name=data_cfg.scene_name,
        )
    from .blender import load_blender_data

    root = data_cfg.data_root if data_cfg.data_root is not None else "data/raw"
    return load_blender_data(
        root, data_cfg.scene_name, split=split, img_scale=data_cfg.img_scale
    )
