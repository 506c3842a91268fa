"""Pallas TPU kernels — fused posenc+MLP (fwd+bwd) and inverse-CDF resample."""

from __future__ import annotations

import jax


def pallas_enabled(tpu_cfg, context: str = "train") -> bool:
    """Resolve TPUConfig.use_pallas: bool or "on"/"off" force; "auto"
    (default) picks the MEASURED-fastest path per context on a TPU
    backend:

      - context="train": False — on the full hierarchical train step,
        XLA storing activations (remat off) beats the fused
        recompute-backward kernel (68.3k vs 65.9k rays/s on v5e): the
        kernel pays an extra forward's FLOPs and its custom-call
        boundaries block cross-op fusion.
      - context="eval" (forward-only): True — no backward exists to
        amortize, and the fused forward wins decisively on MLP-dominant
        work (coarse-192: 91.7k vs 69.8k).
    """
    v = tpu_cfg.use_pallas
    if isinstance(v, str):
        if v == "on":
            return True
        if v == "off":
            return False
        return context == "eval" and jax.default_backend() == "tpu"
    return bool(v)
