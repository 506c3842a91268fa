"""Side-by-side comparison video: fixed-noisy model vs pose-optimized model.

Behavioral parity with the reference script
(scripts/create_comparison_video.py:34-345): render the same spiral path
from two checkpoints — the first with inference-time pose noise injected,
the second clean — then stitch frames horizontally with text labels and
assemble an mp4 via ffmpeg (frames are kept when ffmpeg is unavailable).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robust_nerf_tpu.core.noise import NoiseConfig, add_noise_to_pose  # noqa: E402
from robust_nerf_tpu.evalx.inference import (  # noqa: E402
    create_spiral_poses,
    load_checkpoint,
)
from robust_nerf_tpu.ops.rendering import render_image  # noqa: E402
from robust_nerf_tpu.utils.logger import save_png  # noqa: E402


def render_spiral_frames(
    checkpoint: Path,
    frames_dir: Path,
    n_frames: int,
    noise_config: NoiseConfig | None,
    resolution_scale: float = 1.0,
) -> tuple:
    """Render the spiral path from one checkpoint, optional per-frame noise
    (reference: :34-106)."""
    from robust_nerf_tpu.data.synthetic import load_scene

    models, cfg, _, _ = load_checkpoint(checkpoint)
    scene = load_scene(cfg.data, "train")
    H = max(8, int(scene.H * resolution_scale))
    W = max(8, int(scene.W * resolution_scale))
    focal = scene.focal * resolution_scale

    poses = create_spiral_poses(n_frames=n_frames)
    rng = (
        np.random.default_rng(noise_config.seed)
        if noise_config is not None
        else None
    )
    frames_dir.mkdir(parents=True, exist_ok=True)
    for i, pose in enumerate(poses):
        p = np.asarray(pose)
        if noise_config is not None and noise_config.has_noise:
            dist = float(np.linalg.norm(p[:3, 3]))
            p, _ = add_noise_to_pose(
                p,
                noise_config.rotation_noise_deg,
                noise_config.get_translation_std(dist),
                rng=rng,
            )
        out = render_image(models, p, H, W, focal, cfg.render, cfg.model, cfg.tpu)
        save_png(np.asarray(out["rgb"]), frames_dir / f"frame_{i:04d}.png")
        if (i + 1) % 10 == 0:
            print(f"  {frames_dir.name}: {i + 1}/{n_frames}")
    return H, W


def stitch_frames_horizontal(
    left_dir: Path,
    right_dir: Path,
    out_dir: Path,
    left_label: str,
    right_label: str,
    n_frames: int,
):
    """Horizontally concatenate frame pairs with labels (PIL-based; the
    reference used ffmpeg hstack+drawtext, :109-193 — same output, no
    ffmpeg dependency for the stitching step)."""
    from PIL import Image, ImageDraw

    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n_frames):
        l = Image.open(left_dir / f"frame_{i:04d}.png")
        r = Image.open(right_dir / f"frame_{i:04d}.png")
        w, h = l.size
        canvas = Image.new("RGB", (2 * w, h + 16), "black")
        canvas.paste(l, (0, 16))
        canvas.paste(r, (w, 16))
        draw = ImageDraw.Draw(canvas)
        draw.text((4, 2), left_label, fill="white")
        draw.text((w + 4, 2), right_label, fill="white")
        canvas.save(out_dir / f"frame_{i:04d}.png")


def assemble_video(frames_dir: Path, video_path: Path, fps: int) -> Path:
    try:
        subprocess.run(
            [
                "ffmpeg", "-y", "-framerate", str(fps),
                "-i", str(frames_dir / "frame_%04d.png"),
                "-c:v", "libx264", "-pix_fmt", "yuv420p", str(video_path),
            ],
            check=True,
            capture_output=True,
        )
        print(f"Video: {video_path}")
        return video_path
    except Exception as e:
        print(f"ffmpeg unavailable ({e}); assembling an animated GIF instead")
        try:
            from PIL import Image

            frames = [
                Image.open(p)
                for p in sorted(frames_dir.glob("frame_*.png"))
            ]
            gif_path = video_path.with_suffix(".gif")
            frames[0].save(
                gif_path,
                save_all=True,
                append_images=frames[1:],
                duration=max(1, round(1000 / fps)),
                loop=0,
            )
            print(f"Video (GIF fallback): {gif_path}")
            return gif_path
        except Exception as e2:
            print(f"GIF fallback failed ({e2}); frames kept in {frames_dir}")
            return frames_dir


def main(argv=None):
    parser = argparse.ArgumentParser(
        allow_abbrev=False,
        description="Side-by-side noisy vs pose-optimized comparison video"
    )
    parser.add_argument("--noisy_checkpoint", type=Path, required=True,
                        help="checkpoint trained on fixed noisy poses")
    parser.add_argument("--optimized_checkpoint", type=Path, required=True,
                        help="pose-optimized checkpoint")
    parser.add_argument("--output_dir", type=Path, default=Path("comparison_videos"))
    parser.add_argument("--n_frames", type=int, default=120)
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("--rotation_noise", type=float, default=5.0)
    parser.add_argument("--translation_noise_pct", type=float, default=5.0)
    parser.add_argument("--noise_seed", type=int, default=42)
    parser.add_argument("--resolution_scale", type=float, default=1.0)
    args = parser.parse_args(argv)

    noise = NoiseConfig(
        rotation_noise_deg=args.rotation_noise,
        translation_noise_pct=args.translation_noise_pct,
        seed=args.noise_seed,
    )
    out = args.output_dir
    print("Rendering noisy-model frames (with injected pose noise)...")
    render_spiral_frames(
        args.noisy_checkpoint, out / "noisy_frames", args.n_frames, noise,
        args.resolution_scale,
    )
    print("Rendering optimized-model frames (clean poses)...")
    render_spiral_frames(
        args.optimized_checkpoint, out / "optimized_frames", args.n_frames, None,
        args.resolution_scale,
    )
    print("Stitching...")
    stitch_frames_horizontal(
        out / "noisy_frames", out / "optimized_frames", out / "comparison_frames",
        f"noisy ({noise})", "pose-optimized", args.n_frames,
    )
    assemble_video(out / "comparison_frames", out / "comparison.mp4", args.fps)


if __name__ == "__main__":
    main()
