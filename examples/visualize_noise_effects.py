"""Visualize pose-noise effects: original vs noisy camera positions.

Script equivalent of the reference's notebooks/visualize_noise_effects.ipynb:
loads a scene's poses, injects rotation/translation noise at several levels,
and plots clean vs noisy camera positions plus the per-pose error
distributions.

Usage: python examples/visualize_noise_effects.py [--data_source synthetic]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from robust_nerf_tpu.config import DataConfig  # noqa: E402
from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_poses, compute_pose_error  # noqa: E402
from robust_nerf_tpu.data.synthetic import load_scene  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--scene", default="lego")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--data_source", default="synthetic",
                        choices=["blender", "synthetic"])
    parser.add_argument("--rotation_noise", type=float, default=5.0)
    parser.add_argument("--translation_noise_pct", type=float, default=5.0)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output", default="noise_effects.png")
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cfg = DataConfig(scene_name=args.scene, data_root=args.data_root,
                     source=args.data_source)
    scene = load_scene(cfg, "train")
    clean = np.asarray(scene.poses)
    nc = NoiseConfig(
        rotation_noise_deg=args.rotation_noise,
        translation_noise_pct=args.translation_noise_pct,
        seed=args.seed,
    )
    noisy, infos = add_noise_to_poses(clean, nc)
    errs = [compute_pose_error(clean[i], noisy[i]) for i in range(len(clean))]
    rot_errs = [e["rotation_error_deg"] for e in errs]
    trans_errs = [e["translation_error"] for e in errs]
    print(f"noise '{nc}': rot err mean {np.mean(rot_errs):.2f} deg, "
          f"trans err mean {np.mean(trans_errs):.3f}")

    fig = plt.figure(figsize=(13, 4.5))
    ax = fig.add_subplot(1, 3, 1, projection="3d")
    p0, p1 = clean[:, :3, 3], noisy[:, :3, 3]
    ax.scatter(p0[:, 0], p0[:, 1], p0[:, 2], c="tab:blue", s=20, label="clean")
    ax.scatter(p1[:, 0], p1[:, 1], p1[:, 2], c="tab:red", s=20, label="noisy")
    for a, b in zip(p0, p1):
        ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], "k-", lw=0.5, alpha=0.5)
    ax.legend()
    ax.set_title("camera positions")

    ax = fig.add_subplot(1, 3, 2)
    ax.hist(rot_errs, bins=12, color="tab:orange")
    ax.set_xlabel("rotation error (deg)")
    ax.set_title(f"rotation noise (std {args.rotation_noise} deg)")

    ax = fig.add_subplot(1, 3, 3)
    ax.hist(trans_errs, bins=12, color="tab:green")
    ax.set_xlabel("translation error (scene units)")
    ax.set_title(f"translation noise ({args.translation_noise_pct}% of dist)")

    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
