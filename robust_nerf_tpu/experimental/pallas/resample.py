"""Fused inverse-CDF resampling (hierarchical sampling) Pallas kernel.

The XLA path (core/rays.py:sample_pdf) materializes a (B, S, N) compare
mask plus four masked reductions in HBM — ~15 ms of a 78 ms training step
at batch 4096 (ROADMAP round-1 profile). This kernel never builds that
tensor: the CDF inversion is an ascending sweep over the N bin edges
carrying only per-(ray, sample) latches, so the working set is a few
(S, R) vector registers and HBM traffic is just inputs + outputs.

Layout: rays ride the LANE axis (transposed from the caller's (B, ...) —
the sweep reads one bin edge per step as a (1, R) slab, which is a
dynamic SUBLANE slice (supported) rather than a dynamic lane slice
(Mosaic requires static lane alignment). The tiny (B, N) pdf/cumsum is
left to XLA, where it is free, and transposes happen outside the kernel.

Semantics match the reference inverse-transform sampler
(noisy_src/rays.py:213-279) and the XLA implementation: +1e-5 weight
floor, 0-prepended CDF pinned to end at exactly 1.0,
searchsorted('right')-equivalent edge selection with last-edge fallback,
denom<1e-5 interpolation guard. Deterministic (linspace u) or stochastic
(uniform u drawn OUTSIDE the kernel so PRNG semantics are identical).

No backward: callers resample under stop_gradient (the reference detaches
fine z-values, noisy_src/rays.py:325); inputs are detached so the call
never enters the linearized graph.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 512          # rays per grid step (lane axis)


def _make_kernel(num_bins: int):
    n_bins = num_bins                      # = len(bins) = len(weights) + 1

    def kernel(bins_ref, cdf_ref, u_ref, out_ref):
        # shapes (transposed): bins (N, R), cdf (N-1, R), u/out (S, R)
        u = u_ref[...]
        big = jnp.float32(1e10)

        # CDF inversion: ascending sweep over edges with (S, R) latches.
        # cdf_full = [0, cdf...]; edge 0 (cdf=0, bins[0]) always satisfies
        # cdf <= u, so it is the initial "below" anchor.
        def body(n, carry):
            below_c, below_b, above_c, above_b = carry
            c = cdf_ref[pl.ds(n - 1, 1), :]                     # (1, R)
            b = bins_ref[pl.ds(n, 1), :]
            le = c <= u
            # sorted cdf: the LAST satisfied edge wins "below", the FIRST
            # unsatisfied edge latches "above"
            below_c = jnp.where(le, jnp.broadcast_to(c, u.shape), below_c)
            below_b = jnp.where(le, jnp.broadcast_to(b, u.shape), below_b)
            latch = jnp.logical_and(jnp.logical_not(le), above_c >= big)
            above_c = jnp.where(latch, jnp.broadcast_to(c, u.shape), above_c)
            above_b = jnp.where(latch, jnp.broadcast_to(b, u.shape), above_b)
            return below_c, below_b, above_c, above_b

        init = (
            jnp.zeros_like(u),
            jnp.broadcast_to(bins_ref[0:1, :], u.shape),
            jnp.full_like(u, big),
            jnp.full_like(u, big),
        )
        below_c, below_b, above_c, above_b = jax.lax.fori_loop(
            1, n_bins, body, init
        )
        # no edge above u (u == 1.0): fall back to the last edge
        above_c = jnp.where(
            above_c >= big, cdf_ref[n_bins - 2:n_bins - 1, :], above_c
        )
        above_b = jnp.where(
            above_b >= big, bins_ref[n_bins - 1:n_bins, :], above_b
        )

        denom = above_c - below_c
        denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
        t = (u - below_c) / denom
        out_ref[...] = below_b + t * (above_b - below_b)

    return kernel


def _interpret_default() -> bool:
    """Mosaic only targets TPU; on CPU (tests, dryrun meshes) run the same
    kernel through the Pallas interpreter."""
    return jax.default_backend() != "tpu"


def sample_pdf_fused(
    key: Optional[jax.Array],
    bins: jnp.ndarray,       # (..., N) sorted bin edges
    weights: jnp.ndarray,    # (..., N-1)
    num_samples: int,
    det: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in replacement for core.rays.sample_pdf backed by the fused
    kernel. Returns (..., num_samples); does NOT propagate gradients
    (callers detach — reference noisy_src/rays.py:325)."""
    if interpret is None:
        interpret = _interpret_default()
    # Detach INPUTS, not just the output: the kernel has no autodiff rule,
    # and callers detach anyway — with constant inputs the pallas_call
    # never enters the linearized graph.
    bins = jax.lax.stop_gradient(bins)
    weights = jax.lax.stop_gradient(weights)
    batch_shape = bins.shape[:-1]
    n_bins = bins.shape[-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1

    # pdf -> cdf in XLA: (B, N-1) elementwise + cumsum is noise next to the
    # inversion; endpoint pinned to exactly 1.0 (core/rays.py parity)
    w2 = weights.reshape(b, n_bins - 1) + 1e-5
    pdf = w2 / jnp.sum(w2, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = cdf / cdf[:, -1:]

    if det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.float32),
            (b, num_samples),
        )
    else:
        u = jax.random.uniform(key, (b, num_samples))

    pad = (-b) % TILE_R
    binsT = jnp.pad(bins.reshape(b, n_bins), ((0, pad), (0, 0))).T
    cdfT = jnp.pad(cdf, ((0, pad), (0, 0))).T
    uT = jnp.pad(u, ((0, pad), (0, 0))).T
    n_tiles = (b + pad) // TILE_R

    slab = lambda rows: pl.BlockSpec(
        (rows, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM)
    outT = pl.pallas_call(
        _make_kernel(n_bins),
        grid_spec=pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[slab(n_bins), slab(n_bins - 1), slab(num_samples)],
            out_specs=slab(num_samples),
        ),
        out_shape=jax.ShapeDtypeStruct((num_samples, b + pad), jnp.float32),
        interpret=interpret,
    )(binsT, cdfT, uT)
    return outT.T[:b].reshape(batch_shape + (num_samples,))
