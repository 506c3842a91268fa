"""Export the procedural analytic scene as a Blender-format dataset.

Writes the standard NeRF-synthetic on-disk layout — transforms_{split}.json
plus per-frame PNGs — readable by BOTH this repo's loader
(robust_nerf_tpu/data/blender.py) and the torch reference's
(noisy_src/data.py:50-158). This makes an end-to-end head-to-head on
byte-identical inputs possible in this environment (the real Blender set
cannot be downloaded): both frameworks read the same PNGs through their
own loaders, so loader + training + eval all get exercised.

Layout:
  <out>/<scene>/transforms_{train,val,test}.json
  <out>/<scene>/{train,val,test}/r_{i}.png

Usage:
  python scripts/export_blender_dataset.py --out /tmp/h2h_data \
      --scene synthblobs --resolution 64 --num_train 16 --num_val 3
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def export_split(scene_dir: Path, split: str, scene) -> None:
    from PIL import Image

    (scene_dir / split).mkdir(parents=True, exist_ok=True)
    frames = []
    for i in range(scene.images.shape[0]):
        img8 = np.clip(np.asarray(scene.images[i]) * 255.0 + 0.5, 0, 255).astype(
            np.uint8
        )
        rel = f"./{split}/r_{i}"
        Image.fromarray(img8).save(scene_dir / f"{rel}.png")
        frames.append(
            {
                "file_path": rel,
                "transform_matrix": np.asarray(scene.poses[i], np.float64).tolist(),
            }
        )
    camera_angle_x = float(2.0 * np.arctan(0.5 * scene.W / scene.focal))
    with open(scene_dir / f"transforms_{split}.json", "w") as f:
        json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f, indent=1)


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--scene", type=str, default="synthblobs")
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--num_train", type=int, default=16)
    p.add_argument("--num_val", type=int, default=3)
    p.add_argument("--num_test", type=int, default=0)
    p.add_argument("--num_samples", type=int, default=256,
                   help="dense GT ray samples for the exact render")
    p.add_argument("--textured", action="store_true", default=True)
    p.add_argument("--no_textured", dest="textured", action="store_false")
    args = p.parse_args(argv)

    from robust_nerf_tpu.data.synthetic import make_synthetic_scene

    scene_dir = Path(args.out) / args.scene
    splits = [("train", args.num_train), ("val", args.num_val),
              ("test", args.num_test)]
    for split, n in splits:
        if n <= 0:
            continue
        scene = make_synthetic_scene(
            num_images=n, resolution=args.resolution, split=split,
            num_samples=args.num_samples, textured=args.textured,
        )
        export_split(scene_dir, split, scene)
        print(f"exported {split}: {n} x {args.resolution}^2 -> {scene_dir / split}")
    print(f"dataset root: {args.out} (scene '{args.scene}')")


if __name__ == "__main__":
    main()
