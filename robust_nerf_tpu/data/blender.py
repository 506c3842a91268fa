"""Blender (NeRF-synthetic) scene loading — host-side numpy/PIL.

Parity with the reference loader (noisy_src/data.py:50-158): scene-dir
fallback, transforms_{split}.json parsing, RGBA composited onto white,
LANCZOS resize, focal = 0.5 * W / tan(0.5 * camera_angle_x).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class SceneData:
    """Loaded scene (reference: BlenderData, noisy_src/data.py:25-47).

    images: (N, H, W, 3) float32 in [0, 1]; poses: (N, 4, 4) float32
    camera-to-world.
    """

    images: np.ndarray
    poses: np.ndarray
    H: int
    W: int
    focal: float


def load_blender_data(
    data_root: Path,
    scene_name: str,
    split: str = "train",
    img_scale: float = 0.5,
) -> SceneData:
    """Load one split of a Blender synthetic scene from disk."""
    from PIL import Image

    data_root = Path(data_root)
    scene_dir = None
    for candidate in (data_root / scene_name, data_root / "nerf_synthetic" / scene_name):
        if candidate.exists():
            scene_dir = candidate
            break
    if scene_dir is None:
        raise FileNotFoundError(f"Could not find scene '{scene_name}' in {data_root}")

    transforms_path = scene_dir / f"transforms_{split}.json"
    if not transforms_path.exists():
        raise FileNotFoundError(f"Missing transforms file: {transforms_path}")
    with open(transforms_path) as f:
        meta = json.load(f)

    camera_angle_x = float(meta["camera_angle_x"])
    images, poses = [], []
    for frame in meta["frames"]:
        img_path = scene_dir / f"{frame['file_path']}.png"
        if not img_path.exists():
            raise FileNotFoundError(f"Missing image: {img_path}")
        img = Image.open(img_path)
        if img.mode == "RGBA":
            arr = np.asarray(img, dtype=np.float32) / 255.0
            rgb, alpha = arr[..., :3], arr[..., 3:4]
            rgb = rgb * alpha + (1.0 - alpha)   # white background
            img = Image.fromarray((rgb * 255).astype(np.uint8))
        else:
            img = img.convert("RGB")
        if img_scale != 1.0:
            W0, H0 = img.size
            img = img.resize(
                (int(W0 * img_scale), int(H0 * img_scale)), Image.LANCZOS
            )
        images.append(np.asarray(img, dtype=np.float32) / 255.0)
        poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))

    images = np.stack(images, axis=0)
    poses = np.stack(poses, axis=0)
    H, W = images.shape[1:3]
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    return SceneData(images=images, poses=poses, H=int(H), W=int(W), focal=float(focal))
