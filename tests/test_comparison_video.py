"""Comparison-video tooling tests (scripts/create_comparison_video.py —
reference: scripts/create_comparison_video.py:109-193)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from create_comparison_video import (  # noqa: E402
    assemble_video,
    stitch_frames_horizontal,
)


def _write_frames(d, n, size=(8, 8), value=128):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        arr = np.full((*size, 3), value, np.uint8)
        arr[0, 0] = [i * 10 % 256, 0, 0]   # vary so GIF has >1 distinct frame
        Image.fromarray(arr).save(d / f"frame_{i:04d}.png")


class TestStitch:
    def test_side_by_side_with_label_strip(self, tmp_path):
        _write_frames(tmp_path / "l", 3, value=50)
        _write_frames(tmp_path / "r", 3, value=200)
        out = tmp_path / "stitched"
        stitch_frames_horizontal(
            tmp_path / "l", tmp_path / "r", out, "noisy", "optimized", 3
        )
        frames = sorted(out.glob("frame_*.png"))
        assert len(frames) == 3
        img = np.asarray(Image.open(frames[0]))
        # 2x width, 16px label strip on top
        assert img.shape == (8 + 16, 16, 3)
        # left half body is the dark frame, right half the bright one
        assert abs(int(img[20, 3, 0]) - 50) <= 2
        assert abs(int(img[20, 12, 0]) - 200) <= 2


class TestAssembleVideo:
    def test_gif_fallback_without_ffmpeg(self, tmp_path, monkeypatch):
        """When ffmpeg is absent the assembler must still produce a motion
        artifact (animated GIF), not just keep loose frames."""
        import create_comparison_video as ccv

        _write_frames(tmp_path / "frames", 4)
        # force the ffmpeg path to fail regardless of the host
        monkeypatch.setattr(
            ccv.subprocess, "run",
            lambda *a, **k: (_ for _ in ()).throw(FileNotFoundError("ffmpeg")),
        )
        out = assemble_video(tmp_path / "frames", tmp_path / "video.mp4", fps=10)
        assert out.suffix == ".gif" and out.exists()
        g = Image.open(out)
        assert getattr(g, "n_frames", 1) == 4
