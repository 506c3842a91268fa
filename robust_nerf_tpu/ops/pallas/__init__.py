"""Pallas TPU kernels — fused posenc+MLP (fwd+bwd) and inverse-CDF resample."""

from __future__ import annotations

import jax


def pallas_enabled(tpu_cfg) -> bool:
    """Resolve TPUConfig.use_pallas: bool forces; "on"/"off" force;
    "auto" (default) = fused kernels on a TPU backend only."""
    v = tpu_cfg.use_pallas
    if isinstance(v, str):
        if v == "on":
            return True
        if v == "off":
            return False
        return jax.default_backend() == "tpu"
    return bool(v)
