"""LPIPS perceptual metric — pure-JAX VGG forward, gated on a weights file.

The reference wraps the `lpips` torch package and degrades gracefully when
it is unavailable (noisy_src/metrics.py:119-168). This environment can
never import that package, so the capability is restored natively: the
LPIPS computation (Zhang et al. 2018 — VGG features, per-channel unit
normalization, squared differences weighted by learned 1x1 "lin" layers,
spatially averaged, summed over stages) is implemented in jnp and
activates when a weights archive exists on disk.

Weights archive (.npz) schema — architecture is DATA-driven so any
VGG-style stack works (the production file is exported from the torch
`lpips` VGG16 checkpoint by scripts/export_lpips_weights.py; tests use a
miniature random-weight fixture with the same schema):

  shift (1, 3, 1, 1), scale (1, 3, 1, 1)   input normalization
  conv{s}_{i}_w (O, I, kh, kw), conv{s}_{i}_b (O,)
      3x3 convs of stage s (0-based, consecutive i); 2x2 maxpool between
      stages; the feature tap is the last (post-ReLU) conv of each stage
  lin{s}_w (1, C_s, 1, 1)                   learned LPIPS weights, >= 0

Search order for the archive: $LPIPS_WEIGHTS, then weights/lpips_vgg.npz
relative to the repo root and the current directory.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def default_weight_paths() -> List[Path]:
    paths = []
    env = os.environ.get("LPIPS_WEIGHTS")
    if env:
        paths.append(Path(env))
    repo_root = Path(__file__).resolve().parent.parent.parent
    paths.append(repo_root / "weights" / "lpips_vgg.npz")
    paths.append(Path("weights/lpips_vgg.npz"))
    return paths


def find_weights() -> Optional[Path]:
    for p in default_weight_paths():
        if p.is_file():
            return p
    return None


def _parse_layout(keys) -> List[List[int]]:
    """[[conv indices of stage 0], [stage 1], ...] from archive keys."""
    stages: Dict[int, List[int]] = {}
    for k in keys:
        m = re.fullmatch(r"conv(\d+)_(\d+)_w", k)
        if m:
            stages.setdefault(int(m.group(1)), []).append(int(m.group(2)))
    return [sorted(stages[s]) for s in sorted(stages)]


class LPIPSJax:
    """Callable LPIPS distance. Construct with a weights archive path."""

    def __init__(self, weights_path: Path):
        archive = np.load(weights_path)
        self.params = {k: jnp.asarray(archive[k]) for k in archive.files}
        self.layout = _parse_layout(archive.files)
        self.num_stages = len(self.layout)
        self._fn = jax.jit(self._distance)

    # -- forward -----------------------------------------------------------

    def _features(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """x: (1, 3, H, W) in [-1, 1] -> per-stage feature maps."""
        h = (x - self.params["shift"]) / self.params["scale"]
        feats = []
        for s, convs in enumerate(self.layout):
            for i in convs:
                w = self.params[f"conv{s}_{i}_w"]
                b = self.params[f"conv{s}_{i}_b"]
                kh, kw = w.shape[2], w.shape[3]
                h = jax.lax.conv_general_dilated(
                    h, w, window_strides=(1, 1),
                    padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                    precision=jax.lax.Precision.HIGHEST,
                ) + b[None, :, None, None]
                h = jax.nn.relu(h)
            feats.append(h)
            if s + 1 < self.num_stages:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max,
                    window_dimensions=(1, 1, 2, 2),
                    window_strides=(1, 1, 2, 2),
                    padding="VALID",
                )
        return feats

    def _distance(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = self._features(a)
        fb = self._features(b)
        total = jnp.zeros(())
        for s, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.sqrt(jnp.sum(xa**2, axis=1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, axis=1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = self.params[f"lin{s}_w"]          # (1, C, 1, 1), >= 0
            total = total + jnp.mean(jnp.sum(w * d, axis=1))
        return total

    # -- public ------------------------------------------------------------

    def __call__(self, pred, target) -> float:
        """pred/target: (H, W, 3) in [0, 1] (reference input contract,
        noisy_src/metrics.py:147-156)."""

        def to_nchw(x):
            x = jnp.asarray(x, jnp.float32)
            return jnp.transpose(x, (2, 0, 1))[None] * 2.0 - 1.0

        return float(self._fn(to_nchw(pred), to_nchw(target)))
