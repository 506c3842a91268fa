"""Camera-pose noise injection — seeded, host-side numpy.

Noise is part of experiment *setup*, not the hot path, so it runs on the
host in numpy with its own PRNG stream (reference seeds torch+numpy
globally, noisy_src/noise.py:65-68; here the stream is a local Generator so
seeding never leaks into unrelated code). Semantics match the reference:
Gaussian angle / uniform axis rotation applied in the world frame
(R_noisy = R_noise @ R), additive Gaussian translation, and per-pose
percentage-of-camera-distance translation std.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class NoiseConfig:
    """Reference semantics: noisy_src/noise.py:18-62 (incl. __str__ naming)."""

    rotation_noise_deg: float = 0.0
    translation_noise: float = 0.0       # absolute scene units
    translation_noise_pct: float = 0.0   # percent of camera distance
    seed: Optional[int] = None

    def __str__(self) -> str:
        parts = []
        if self.rotation_noise_deg > 0:
            parts.append(f"rot{self.rotation_noise_deg:.1f}deg")
        if self.translation_noise_pct > 0:
            parts.append(f"trans{self.translation_noise_pct:.1f}pct")
        elif self.translation_noise > 0:
            parts.append(f"trans{self.translation_noise:.3f}")
        return "_".join(parts) if parts else "clean"

    @property
    def has_noise(self) -> bool:
        return (
            self.rotation_noise_deg > 0
            or self.translation_noise > 0
            or self.translation_noise_pct > 0
        )

    def get_translation_std(self, camera_distance: float) -> float:
        if self.translation_noise_pct > 0:
            return camera_distance * (self.translation_noise_pct / 100.0)
        return self.translation_noise


# Module-level default stream for callers that do not pass an explicit
# Generator — set_noise_seed() re-seeds it, giving the reference's
# global-seed reproducibility contract (noisy_src/noise.py:65-68) without
# touching numpy's global state used by unrelated code.
_default_rng = np.random.default_rng()


def set_noise_seed(seed: int) -> None:
    """Seed the default noise stream (reference: noisy_src/noise.py:65-68).

    The reference seeds torch+numpy globally; here only the noise module's
    own Generator is re-seeded (explicit-rng callers are unaffected), plus
    numpy's legacy global state for code that still reads it.
    """
    global _default_rng
    _default_rng = np.random.default_rng(seed)
    np.random.seed(seed)


def random_translation(
    std: float, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Gaussian 3-vector translation noise (reference: noise.py:116-135)."""
    if std == 0:
        return np.zeros(3, dtype=np.float32)
    if rng is None:
        rng = _default_rng
    return (rng.standard_normal(3) * std).astype(np.float32)


def random_rotation_matrix(std_deg: float, rng: np.random.Generator) -> np.ndarray:
    """Random rotation: Gaussian angle (std_deg), uniform axis, Rodrigues.

    Reference semantics: noisy_src/noise.py:71-113.
    """
    if std_deg == 0:
        return np.eye(3, dtype=np.float32)
    angle = rng.standard_normal() * (std_deg * np.pi / 180.0)
    axis = rng.standard_normal(3)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0.0, -axis[2], axis[1]],
            [axis[2], 0.0, -axis[0]],
            [-axis[1], axis[0], 0.0],
        ]
    )
    R = np.eye(3) + np.sin(angle) * K + (1.0 - np.cos(angle)) * (K @ K)
    return R.astype(np.float32)


def add_noise_to_pose(
    pose: np.ndarray,
    rotation_noise_deg: float = 0.0,
    translation_noise: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, dict]:
    """Perturb one 4x4 camera-to-world pose.

    Reference semantics: noisy_src/noise.py:138-187 — left-multiplied
    rotation noise, additive translation noise, and a noise_info dict with
    the actually-applied rotation angle (via the trace formula).
    """
    if rng is None:
        rng = _default_rng   # seedable via set_noise_seed()
    noisy = np.array(pose, dtype=np.float32, copy=True)
    info = {
        "rotation_noise_deg": rotation_noise_deg,
        "translation_noise": translation_noise,
    }
    if rotation_noise_deg > 0:
        R_noise = random_rotation_matrix(rotation_noise_deg, rng)
        noisy[:3, :3] = R_noise @ pose[:3, :3]
        trace = np.trace(R_noise)
        angle = np.arccos(np.clip((trace - 1.0) / 2.0, -1.0, 1.0))
        info["actual_rotation_deg"] = float(angle * 180.0 / np.pi)
    if translation_noise > 0:
        t_noise = random_translation(translation_noise, rng)
        noisy[:3, 3] = pose[:3, 3] + t_noise
        info["actual_translation_norm"] = float(np.linalg.norm(t_noise))
    return noisy, info


def add_noise_to_poses(
    poses: np.ndarray, noise_config: NoiseConfig
) -> Tuple[np.ndarray, List[dict]]:
    """Perturb a batch of (N, 4, 4) poses with per-pose %-distance conversion.

    Reference semantics: noisy_src/noise.py:190-234.
    """
    # Explicit seed -> its own reproducible stream; seed=None -> the
    # module default stream, so set_noise_seed() governs it (reference
    # global-seed contract, noise.py:65-68).
    rng = (
        np.random.default_rng(noise_config.seed)
        if noise_config.seed is not None
        else _default_rng
    )
    poses = np.asarray(poses, dtype=np.float32)
    noisy_list, infos = [], []
    for i in range(poses.shape[0]):
        camera_distance = float(np.linalg.norm(poses[i][:3, 3]))
        trans_std = noise_config.get_translation_std(camera_distance)
        noisy, info = add_noise_to_pose(
            poses[i],
            rotation_noise_deg=noise_config.rotation_noise_deg,
            translation_noise=trans_std,
            rng=rng,
        )
        noisy_list.append(noisy)
        infos.append(info)
    return np.stack(noisy_list, axis=0), infos


def compute_pose_error(pose_gt: np.ndarray, pose_noisy: np.ndarray) -> dict:
    """Geodesic rotation error (deg) + Euclidean translation error.

    Reference semantics: noisy_src/noise.py:237-268.
    """
    R_diff = pose_gt[:3, :3].T @ pose_noisy[:3, :3]
    angle = np.arccos(np.clip((np.trace(R_diff) - 1.0) / 2.0, -1.0, 1.0))
    return {
        "rotation_error_deg": float(angle * 180.0 / np.pi),
        "translation_error": float(np.linalg.norm(pose_gt[:3, 3] - pose_noisy[:3, 3])),
    }
