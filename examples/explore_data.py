"""Explore a scene: sample images + 3D camera-pose cloud.

Script equivalent of the reference's notebooks/explore_data.ipynb: loads a
scene (on-disk Blender if available, otherwise the procedural synthetic
scene), shows a grid of sample images, and plots camera positions/viewing
directions in 3D.

Usage: python examples/explore_data.py [--data_root ...] [--scene lego]
       [--data_source synthetic]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from robust_nerf_tpu.config import DataConfig  # noqa: E402
from robust_nerf_tpu.data.synthetic import load_scene  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--scene", default="lego")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--data_source", default="synthetic",
                        choices=["blender", "synthetic"])
    parser.add_argument("--split", default="train")
    parser.add_argument("--output", default="explore_data.png")
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cfg = DataConfig(scene_name=args.scene, data_root=args.data_root,
                     source=args.data_source)
    scene = load_scene(cfg, args.split)
    print(f"{scene.images.shape[0]} images at {scene.H}x{scene.W}, "
          f"focal {scene.focal:.1f}")

    fig = plt.figure(figsize=(12, 5))
    # sample image grid
    for i in range(min(4, scene.images.shape[0])):
        ax = fig.add_subplot(2, 4, i + 1)
        ax.imshow(scene.images[i])
        ax.set_title(f"image {i}")
        ax.axis("off")
    # 3D pose cloud: camera positions + viewing directions
    ax = fig.add_subplot(1, 2, 2, projection="3d")
    pos = scene.poses[:, :3, 3]
    view = -scene.poses[:, :3, 2]   # cameras look down -Z
    ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c="tab:blue", s=20)
    ax.quiver(pos[:, 0], pos[:, 1], pos[:, 2],
              view[:, 0], view[:, 1], view[:, 2],
              length=0.8, color="tab:orange", alpha=0.6)
    ax.scatter([0], [0], [0], c="red", marker="*", s=100)
    ax.set_title("camera poses (red star = scene origin)")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
