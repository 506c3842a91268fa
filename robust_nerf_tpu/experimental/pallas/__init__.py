"""Pallas TPU kernels — fused posenc+MLP (fwd+bwd) and inverse-CDF resample."""

from __future__ import annotations


def pallas_enabled(tpu_cfg, context: str = "train") -> bool:
    """Resolve TPUConfig.use_pallas: bool or "on"/"off" force; "auto"
    (default) picks the MEASURED-fastest path per context on a TPU
    backend — currently plain XLA for BOTH contexts:

      - context="train": False — on the full hierarchical train step,
        XLA storing activations (remat off) beats the fused
        recompute-backward kernel (127.3k vs 72.2k rays/s at the
        batch-256 optimum on v5e; 68.3k vs 65.9k at the old batch
        4096): the kernel pays an extra forward's FLOPs and its
        custom-call boundaries block cross-op fusion.
      - context="eval": False since round 3. The round-2 policy routed
        eval through the fused forward based on an MLP-dominant
        microbench (coarse-192: fused 91.7k vs XLA 69.8k @tile 4096),
        but on the production surface — the full-frame hierarchical
        render — XLA wins at EVERY tile size and both compute dtypes
        (scripts/profile_eval.py, v5e, 400x400: XLA 386.7k rays/s vs
        fused 228.8k at the tile-256 optimum, f32; 352.6k vs 223.4k
        bf16). The microbench omitted ray-gen/resample/compositing,
        exactly the ops XLA fuses across the MLP boundary and a
        custom call cannot.

    The kernels remain forceable ("on") and exact-parity tested.
    """
    v = tpu_cfg.use_pallas
    if isinstance(v, str):
        if v not in ("on", "off", "auto"):
            raise ValueError(
                f"TPUConfig.use_pallas={v!r}: expected 'on', 'off', 'auto', "
                "or a bool (a typo here would silently measure XLA twice "
                "in a forced-kernel A/B)"
            )
        return v == "on"
    return bool(v)
