"""Standalone numpy noise utilities for transforms JSON files.

Behavioral parity with the reference script (scripts/inject_noise.py:15-122):
elementwise matrix noise, intrinsics perturbation, extrinsics perturbation,
and whole-transforms-dict noising — plus a CLI that reads/writes
transforms_*.json. Unlike the reference (which uses a first-order exp-map
approximation R + [w]x R, scripts/inject_noise.py:49-85), extrinsic rotation
noise here uses the exact Rodrigues rotation from the core noise module so
the injected noise is a true SO(3) element at any magnitude.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from robust_nerf_tpu.core.noise import random_rotation_matrix  # noqa: E402


def add_matrix_noise(
    matrix: np.ndarray, std: float, rng: np.random.Generator
) -> np.ndarray:
    """Elementwise Gaussian noise on a matrix (reference: :15-33)."""
    return matrix + rng.standard_normal(matrix.shape) * std


def perturb_intrinsics(
    camera_angle_x: float, std_pct: float, rng: np.random.Generator
) -> float:
    """Relative Gaussian perturbation of the FOV (reference: :36-46)."""
    return float(camera_angle_x * (1.0 + rng.standard_normal() * std_pct / 100.0))


def perturb_extrinsics(
    c2w: np.ndarray,
    rotation_std_deg: float,
    translation_std: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """Perturb a 4x4 camera-to-world with exact SO(3) rotation noise
    (reference: :49-85 used the first-order approx R + [w]x R)."""
    out = np.array(c2w, dtype=np.float64, copy=True)
    if rotation_std_deg > 0:
        R_noise = random_rotation_matrix(rotation_std_deg, rng)
        out[:3, :3] = R_noise @ out[:3, :3]
    if translation_std > 0:
        out[:3, 3] += rng.standard_normal(3) * translation_std
    return out


def perturb_transforms_dict(
    transforms: dict,
    rotation_std_deg: float = 0.0,
    translation_std: float = 0.0,
    intrinsics_std_pct: float = 0.0,
    seed: int | None = None,
) -> dict:
    """Noise every frame of a transforms JSON dict (reference: :88-113)."""
    rng = np.random.default_rng(seed)
    out = dict(transforms)
    if intrinsics_std_pct > 0 and "camera_angle_x" in out:
        out["camera_angle_x"] = perturb_intrinsics(
            out["camera_angle_x"], intrinsics_std_pct, rng
        )
    frames = []
    for frame in transforms.get("frames", []):
        f = dict(frame)
        m = np.asarray(frame["transform_matrix"], dtype=np.float64)
        f["transform_matrix"] = perturb_extrinsics(
            m, rotation_std_deg, translation_std, rng
        ).tolist()
        frames.append(f)
    out["frames"] = frames
    out["noise_injection"] = {
        "rotation_std_deg": rotation_std_deg,
        "translation_std": translation_std,
        "intrinsics_std_pct": intrinsics_std_pct,
        "seed": seed,
    }
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(
        allow_abbrev=False,
        description="Inject noise into a Blender transforms JSON"
    )
    parser.add_argument("input", type=Path, nargs="?", default=None,
                        help="transforms_*.json (omit to run the smoke test)")
    parser.add_argument("--output", type=Path, default=None)
    parser.add_argument("--rotation_std_deg", type=float, default=0.0)
    parser.add_argument("--translation_std", type=float, default=0.0)
    parser.add_argument("--intrinsics_std_pct", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args(argv)

    if args.input is None:
        # smoke test (reference: :116-122)
        rng = np.random.default_rng(0)
        eye = np.eye(4)
        noisy = perturb_extrinsics(eye, 5.0, 0.1, rng)
        R = noisy[:3, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-8), "not a rotation"
        d = perturb_transforms_dict(
            {"camera_angle_x": 0.69, "frames": [{"transform_matrix": eye.tolist()}]},
            rotation_std_deg=2.0, translation_std=0.05, seed=1,
        )
        assert "noise_injection" in d
        print("inject_noise smoke test passed")
        return

    with open(args.input) as f:
        transforms = json.load(f)
    noisy = perturb_transforms_dict(
        transforms,
        rotation_std_deg=args.rotation_std_deg,
        translation_std=args.translation_std,
        intrinsics_std_pct=args.intrinsics_std_pct,
        seed=args.seed,
    )
    output = args.output or args.input.with_name(
        args.input.stem + "_noisy" + args.input.suffix
    )
    with open(output, "w") as f:
        json.dump(noisy, f, indent=2)
    print(f"Wrote {output}")


if __name__ == "__main__":
    main()
