"""Experimental components — measured, parity-tested, NOT the production path.

Round-4 settlement of the Pallas question (VERDICT r3 #5): the hand-written
Mosaic kernels live here because plain XLA beats them on every production
surface of this workload on v5e (DESIGN.md "Fused Pallas kernel" for the
full A/B history):

- train step: XLA 127.3k rays/s vs fused recompute-backward 72.2k at the
  batch-256 optimum (store-mode 78.0k).
- full-frame eval: XLA wins at EVERY tile size and both compute dtypes
  (386.7k vs 228.8k rays/s at the tile-256 optimum, f32 400x400).
- inverse-CDF resample: a wash in-step (65.0k vs 65.2k).

Why extending fusion scope would not change the outcome: the fused forward
already has near-zero HBM traffic per ray (points in, rgb/sigma out, weights
VMEM-resident), i.e. it is compute-bound by construction, yet it sustains
only ~23% MXU utilization vs ~40% for XLA's emitted matmul chain at the
same shapes. The deficit is inside the Mosaic kernel's matmul scheduling,
not at fusion boundaries — compositing/ray-gen add negligible FLOPs and
traffic, so folding them in (SURVEY §3.5's original target) cannot close a
1.7x inner-loop gap. The round-2 "fused eval wins" call came from an
MLP-dominant microbench; the production-surface sweep reversed it.

Everything here remains exact-parity tested (tests/test_pallas.py) and
force-enablable (TPUConfig.use_pallas="on") for future re-evaluation on
other TPU generations or Mosaic versions; "auto" resolves to XLA.
"""
