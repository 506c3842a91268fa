"""Fused positional-encoding + NeRF-MLP Pallas kernel.

The hot op of the whole framework (SURVEY.md §3.5): for every sample point,
encode -> 8x256 trunk (skip-concat) -> sigma/feature/color heads. The XLA
path materializes the (N, 63) encoding and every (N, 256) activation in
HBM — ~7 GB of traffic per 786k-point batch, which makes it HBM-bound.
This kernel keeps the entire parameter set (~2.4 MB f32) and all per-tile
activations in VMEM, so HBM traffic collapses to inputs + outputs.

Encoding trick: building gamma(x) by concatenating 2L+1 width-3 pieces is
VPU-hostile (3/128 lane occupancy per op). Instead the encoding is ONE
matmul: t = x @ P where P (3, S) routes channel c scaled by 2^k into its
slot, followed by enc = m_id*t + m_sin*sin(t) + m_cos*cos(t) with per-slot
masks — full-lane-width VPU ops and an MXU matmul. Trunk/head weights are
zero-row-padded to match the padded slot layout, so results equal the
math of models.nerf.nerf_apply (slot order matches positional_encoding's
[x, per-freq sin(3) cos(3)] layout exactly; padded slots multiply zero
weight rows).

Grad support: custom VJP with a FUSED PALLAS BACKWARD — each tile
recomputes its forward activations in VMEM (nothing spills to HBM),
backprops through the nine matmuls on the MXU, accumulates dW/db into
constant-index output blocks across grid steps, and streams d_pts/d_dirs
tiles out. HBM traffic for the whole fwd+bwd is inputs + cotangents +
parameter-sized gradients — the XLA path materializes every (N, 256)
activation twice. Set ROBUST_NERF_PALLAS_BWD=0 to fall back to an XLA
recompute backward (exact gradients of the same math, useful for A/B).

Falls back to `nerf_apply` for configs without view directions.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ModelConfig
from ...models.nerf import nerf_apply

import os

TILE = 1024            # points per grid step (forward)
TILE_BWD = int(os.environ.get("ROBUST_NERF_TILE_BWD", "512"))
                       # points per grid step (backward: activations + dW
                       # accumulators must fit VMEM alongside the weights;
                       # 512 fits only because skip-concat buffers are
                       # never materialized — see _make_bwd_kernel).
                       # Env-overridable for tuning runs.


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _encoding_tables(num_freqs: int, pad_to: int):
    """(P (3, S), m_id (1, S), m_sin (1, S), m_cos (1, S)), S = pad_to.

    Slot layout matches positional_encoding: [x0,x1,x2] then per freq k:
    [sin(2^k x0..2), cos(2^k x0..2)]; trailing slots are padding (all
    masks zero -> encoding exactly 0 there).
    """
    dim = 3 * (1 + 2 * num_freqs)
    S = max(pad_to, dim)
    P = np.zeros((3, S), np.float32)
    m_id = np.zeros((S,), np.float32)
    m_sin = np.zeros((S,), np.float32)
    m_cos = np.zeros((S,), np.float32)
    for c in range(3):
        P[c, c] = 1.0
        m_id[c] = 1.0
    for k in range(num_freqs):
        f = float(2.0**k)
        base = 3 + 6 * k
        for c in range(3):
            P[c, base + c] = f          # sin slot
            m_sin[base + c] = 1.0
            P[c, base + 3 + c] = f      # cos slot
            m_cos[base + 3 + c] = 1.0
    # numpy, not device arrays: this cache is shared across traces, and a
    # device array materialized inside one jit trace must not leak into
    # another (UnexpectedTracerError).
    return (P, m_id.reshape(1, -1), m_sin.reshape(1, -1), m_cos.reshape(1, -1))


def _prepare_weights(params, cfg: ModelConfig, compute_dtype=None):
    """Repack params for the padded-slot encoding layout.

    pos encoding dim 63 -> S_pos (64); dir encoding 27 -> S_dir (32). Any
    weight consuming an encoding gets zero rows at the padding slots
    (zero rows x zero activations = identical math).

    When `compute_dtype` is given, the W matrices are cast to it HERE, once
    per call, instead of per grid step inside the kernel (the kernel's
    `.astype(cdt)` then no-ops). This halves the weights' VMEM residency in
    bf16 mode and drops ~19 per-tile VPU cast sweeps. Biases stay f32 —
    they are added to the f32 matmul accumulators, not fed to the MXU.
    """
    pos_dim = 3 * (1 + 2 * cfg.pos_freqs)
    dir_dim = 3 * (1 + 2 * cfg.dir_freqs)
    S_pos = _round_up(pos_dim, 64)
    S_dir = _round_up(dir_dim, 32)
    H = cfg.hidden_dim

    ws = []

    def add(w, b):
        if compute_dtype is not None:
            w = w.astype(compute_dtype)
        ws.append(w)
        ws.append(b.reshape(1, -1).astype(jnp.float32))

    for i in range(cfg.num_hidden_layers):
        w = params[f"trunk_{i}_w"]
        if i == 0:
            w = jnp.pad(w, ((0, S_pos - pos_dim), (0, 0)))
        elif (i - 1) in cfg.skips:
            # layer input was concat([x_enc, h]); x_enc rows move to the
            # padded block, h rows follow after S_pos
            w = jnp.concatenate(
                [
                    jnp.pad(w[:pos_dim], ((0, S_pos - pos_dim), (0, 0))),
                    w[pos_dim:],
                ],
                axis=0,
            )
        add(w, params[f"trunk_{i}_b"])

    add(params["sigma_w"], params["sigma_b"])
    add(params["feat_w"], params["feat_b"])
    # dir-head input: concat([feats (H), d_enc (dir_dim -> S_dir padded)])
    dw = jnp.concatenate(
        [
            params["dir_w"][:H],
            jnp.pad(params["dir_w"][H:], ((0, S_dir - dir_dim), (0, 0))),
        ],
        axis=0,
    )
    add(dw, params["dir_b"])
    add(params["rgb_w"], params["rgb_b"])
    return ws, S_pos, S_dir


def _make_kernel(cfg: ModelConfig, compute_dtype, store_acts: bool = False):
    """Forward kernel. With `store_acts`, the 8 post-ReLU trunk activations
    are ALSO streamed out (compute dtype) so a store-mode backward can read
    them instead of recomputing the trunk (ROBUST_NERF_PALLAS_STORE=1) —
    the same store-vs-recompute tradeoff XLA's autodiff makes."""
    n_layers = cfg.num_hidden_layers
    skips = set(cfg.skips)

    def kernel(pts_ref, dirs_ref, pos_P, pos_id, pos_sin, pos_cos,
               dir_P, dir_id, dir_sin, dir_cos, *refs):
        n_out = 2 + (n_layers if store_acts else 0)
        weight_refs = refs[:-n_out]
        rgb_out, sigma_out = refs[-n_out], refs[-n_out + 1]
        h_outs_refs = refs[-n_out + 2:] if store_acts else ()

        def w(i):
            return weight_refs[i][...]

        def encode(x, P_ref, id_ref, sin_ref, cos_ref):
            # HIGHEST precision: the slot matmul feeds sin/cos at args up
            # to 2^{L-1}*|x| ~ 600; bf16-pass error there wrecks the high
            # frequencies. K=3, so the exact path costs nothing.
            t = jnp.dot(x, P_ref[...], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            return (
                id_ref[...] * t
                + sin_ref[...] * jnp.sin(t)
                + cos_ref[...] * jnp.cos(t)
            )

        x_enc = encode(pts_ref[...], pos_P, pos_id, pos_sin, pos_cos)
        h = x_enc
        idx = 0
        for i in range(n_layers):
            h = (
                jnp.dot(h.astype(compute_dtype), w(idx).astype(compute_dtype),
                        preferred_element_type=jnp.float32)
                + w(idx + 1)
            )
            h = jnp.maximum(h, 0.0)
            if store_acts:
                h_outs_refs[i][...] = h.astype(h_outs_refs[i].dtype)
            if i in skips:
                h = jnp.concatenate([x_enc, h], axis=-1)
            idx += 2

        raw_sigma = (
            jnp.dot(h.astype(compute_dtype), w(idx).astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + w(idx + 1)
        )
        if cfg.sigma_activation == "softplus":
            sigma = jax.nn.softplus(raw_sigma)
        else:
            sigma = jnp.maximum(raw_sigma, 0.0)

        feats = (
            jnp.dot(h.astype(compute_dtype), w(idx + 2).astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + w(idx + 3)
        )
        d_enc = encode(dirs_ref[...], dir_P, dir_id, dir_sin, dir_cos)
        h_color = jnp.concatenate([feats, d_enc], axis=-1)
        h_color = (
            jnp.dot(h_color.astype(compute_dtype),
                    w(idx + 4).astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + w(idx + 5)
        )
        h_color = jnp.maximum(h_color, 0.0)
        rgb = (
            jnp.dot(h_color.astype(compute_dtype),
                    w(idx + 6).astype(compute_dtype),
                    preferred_element_type=jnp.float32)
            + w(idx + 7)
        )
        rgb_out[...] = jax.nn.sigmoid(rgb)
        sigma_out[...] = sigma

    return kernel


def supports(cfg: ModelConfig) -> bool:
    # a skip after the LAST trunk layer would make the heads consume a
    # concat the fused backward never materializes — no reference config
    # does that; fall back to XLA if one ever does
    return cfg.use_view_dirs and (cfg.num_hidden_layers - 1) not in cfg.skips


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, functools.partial(lambda n, i: (0,) * n, nd),
        memory_space=pltpu.VMEM,
    )


def _interpret_default() -> bool:
    """Mosaic only targets TPU; on CPU (tests, dryrun meshes) run the same
    kernels through the Pallas interpreter."""
    return jax.default_backend() != "tpu"


def _fused_forward(params, pts2d, dirs2d, cfg: ModelConfig, dtype_str: str,
                   interpret: Optional[bool] = None,
                   store_acts: bool = False):
    """(N, 3) points/dirs -> (rgb (N, 3), sigma (N, 1)); N % TILE == 0.

    With `store_acts`, additionally returns the list of 8 (N, H) post-ReLU
    trunk activations in the compute dtype (for the store-mode backward)."""
    if interpret is None:
        interpret = _interpret_default()
    n = pts2d.shape[0]
    compute_dtype = jnp.dtype(dtype_str)
    weights, S_pos, S_dir = _prepare_weights(params, cfg, compute_dtype)
    pos_tabs = _encoding_tables(cfg.pos_freqs, S_pos)
    dir_tabs = _encoding_tables(cfg.dir_freqs, S_dir)
    tabs = [jnp.asarray(t) for t in (*pos_tabs, *dir_tabs)]
    n_tiles = n // TILE

    act_specs, act_shapes = [], []
    if store_acts:
        H = cfg.hidden_dim
        for _ in range(cfg.num_hidden_layers):
            act_specs.append(pl.BlockSpec((TILE, H), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            act_shapes.append(jax.ShapeDtypeStruct((n, H), compute_dtype))

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + [_const_spec(t.shape) for t in tabs]
        + [_const_spec(wt.shape) for wt in weights],
        out_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + act_specs,
    )

    outs = pl.pallas_call(
        _make_kernel(cfg, compute_dtype, store_acts=store_acts),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ] + act_shapes,
        interpret=interpret,
    )(pts2d, dirs2d, *tabs, *weights)
    if store_acts:
        return outs[0], outs[1], list(outs[2:])
    return outs[0], outs[1]


def _make_bwd_kernel(cfg: ModelConfig, compute_dtype, n_weights: int,
                     stored: bool = False):
    """Fused backward: backprop through all matmuls on the MXU, accumulate
    dW/db across grid steps. Trunk activations come from one of two
    sources — recomputed per tile in VMEM (default), or read from input
    tiles written by the store-mode forward (`stored`, the
    ROBUST_NERF_PALLAS_STORE=1 path); all gradient math is shared."""
    n_layers = cfg.num_hidden_layers
    skips = set(cfg.skips)
    H = cfg.hidden_dim
    cdt = compute_dtype

    def kernel(pts_ref, dirs_ref, grgb_ref, gsigma_ref,
               pos_P, pos_id, pos_sin, pos_cos,
               dir_P, dir_id, dir_sin, dir_cos, *refs):
        if stored:
            h_refs, refs = refs[:n_layers], refs[n_layers:]
        weight_refs = refs[:n_weights]
        dpts_ref, ddirs_ref = refs[n_weights], refs[n_weights + 1]
        acc_refs = refs[n_weights + 2:]

        # dW/db accumulators: constant-index output blocks stay resident in
        # VMEM across sequential grid steps — zero once, += every tile.
        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in acc_refs:
                r[...] = jnp.zeros_like(r)

        def w(i):
            return weight_refs[i][...]

        def mm(a, b):                      # a @ b, f32 accum
            return jnp.dot(a.astype(cdt), b.astype(cdt),
                           preferred_element_type=jnp.float32)

        def mm_at_b(a, b):                 # a^T @ b (contract batch rows)
            return jax.lax.dot_general(
                a.astype(cdt), b.astype(cdt),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def mm_a_bt(a, b):                 # a @ b^T (contract features)
            return jax.lax.dot_general(
                a.astype(cdt), b.astype(cdt),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # ---- forward recompute (everything stays in VMEM) ---------------
        def encode_t(x, P_ref):
            # HIGHEST: see the forward kernel — sin/cos args reach ~2^L|x|.
            return jnp.dot(x, P_ref[...], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)

        t_pos = encode_t(pts_ref[...], pos_P)
        x_enc = (pos_id[...] * t_pos + pos_sin[...] * jnp.sin(t_pos)
                 + pos_cos[...] * jnp.cos(t_pos))
        t_dir = encode_t(dirs_ref[...], dir_P)
        d_enc = (dir_id[...] * t_dir + dir_sin[...] * jnp.sin(t_dir)
                 + dir_cos[...] * jnp.cos(t_dir))
        x_enc_c = x_enc.astype(cdt)
        d_enc_c = d_enc.astype(cdt)
        S_pos = x_enc.shape[-1]

        # Skip-concat inputs are never materialized: layers fed by
        # concat([x_enc, h]) split their matmul over the packed weight's
        # row blocks (w[:S_pos] / w[S_pos:]) — saves (T, S_pos+H) buffers
        # in both directions, which is what keeps TILE_BWD=512 under the
        # 16 MB scoped-VMEM stack limit.
        # ReLU masks are NOT stored: d_relu is recovered as h_i(i) > 0
        # (post-ReLU output positive <=> pre-activation positive; at the
        # measure-zero a == 0 boundary both give subgradient 0, matching
        # torch). Keeping 8 (T, 256) compare results live from the forward
        # recompute to the backward costs ~4 MB of the 16 MB scoped-VMEM
        # stack at T=512 — dropping them is what lets TILE_BWD grow.
        if stored:
            def h_i(i):                  # stream from the fwd's HBM copies
                return h_refs[i][...]
        else:
            h_outs = []                  # recompute (compute dtype)
            h_prev = x_enc_c
            for i in range(n_layers):
                if i > 0 and (i - 1) in skips:
                    a = (mm(x_enc_c, w(2 * i)[:S_pos])
                         + mm(h_prev, w(2 * i)[S_pos:]) + w(2 * i + 1))
                else:
                    a = mm(h_prev, w(2 * i)) + w(2 * i + 1)
                h_prev = jnp.maximum(a, 0.0).astype(cdt)
                h_outs.append(h_prev)

            def h_i(i):
                return h_outs[i]
        h = h_i(n_layers - 1)
        assert (n_layers - 1) not in skips, (
            "a skip after the last trunk layer is not supported by the "
            "fused backward (heads would consume a concat)"
        )

        idx = 2 * n_layers
        raw_sigma = mm(h, w(idx)) + w(idx + 1)                 # (T, 1)
        feats = (mm(h, w(idx + 2)) + w(idx + 3)).astype(cdt)   # (T, H)
        a_c = (mm(feats, w(idx + 4)[:H])
               + mm(d_enc_c, w(idx + 4)[H:]) + w(idx + 5))
        h_c = jnp.maximum(a_c, 0.0).astype(cdt)
        rgb_raw = mm(h_c, w(idx + 6)) + w(idx + 7)
        rgb = jax.nn.sigmoid(rgb_raw)

        # ---- backward ----------------------------------------------------
        g_rgb = grgb_ref[...]
        g_sigma = gsigma_ref[...]

        d_rgb_raw = g_rgb * rgb * (1.0 - rgb)
        dWr = mm_at_b(h_c, d_rgb_raw)
        dbr = jnp.sum(d_rgb_raw, axis=0, keepdims=True)
        d_hc = mm_a_bt(d_rgb_raw, w(idx + 6))
        d_ac = jnp.where(a_c > 0.0, d_hc, 0.0)
        dWd_top = mm_at_b(feats, d_ac)                # rows [:H]
        dWd_bot = mm_at_b(d_enc_c, d_ac)              # rows [H:]
        dbd = jnp.sum(d_ac, axis=0, keepdims=True)
        d_feats = mm_a_bt(d_ac, w(idx + 4)[:H])
        d_denc = mm_a_bt(d_ac, w(idx + 4)[H:])

        if cfg.sigma_activation == "softplus":
            d_raw_sigma = g_sigma * jax.nn.sigmoid(raw_sigma)
        else:
            d_raw_sigma = jnp.where(raw_sigma > 0.0, g_sigma, 0.0)
        dWs = mm_at_b(h, d_raw_sigma)
        dbs = jnp.sum(d_raw_sigma, axis=0, keepdims=True)
        dWf = mm_at_b(h, d_feats)
        dbf = jnp.sum(d_feats, axis=0, keepdims=True)
        d_h = mm_a_bt(d_raw_sigma, w(idx)) + mm_a_bt(d_feats, w(idx + 2))

        d_xenc = jnp.zeros_like(x_enc)
        g = d_h
        trunk_w_grads = [None] * n_layers   # value or (top, bottom) pair
        trunk_b_grads = [None] * n_layers
        for i in range(n_layers - 1, -1, -1):
            # mask from the kept output (cast first: Mosaic rejects cmpf
            # on packed-bf16 vectors); one transient f32 copy at a time
            # instead of 8 stored masks
            d_a = jnp.where(h_i(i).astype(jnp.float32) > 0.0, g, 0.0)
            trunk_b_grads[i] = jnp.sum(d_a, axis=0, keepdims=True)
            if i == 0:
                trunk_w_grads[i] = mm_at_b(x_enc_c, d_a)
                d_xenc = d_xenc + mm_a_bt(d_a, w(0))
            elif (i - 1) in skips:
                trunk_w_grads[i] = (
                    mm_at_b(x_enc_c, d_a),            # rows [:S_pos]
                    mm_at_b(h_i(i - 1), d_a),         # rows [S_pos:]
                )
                d_xenc = d_xenc + mm_a_bt(d_a, w(2 * i)[:S_pos])
                g = mm_a_bt(d_a, w(2 * i)[S_pos:])
            else:
                trunk_w_grads[i] = mm_at_b(h_i(i - 1), d_a)
                g = mm_a_bt(d_a, w(2 * i))

        # encoding backward: enc = m_id*t + m_sin*sin t + m_cos*cos t
        d_tpos = d_xenc * (pos_id[...] + pos_sin[...] * jnp.cos(t_pos)
                           - pos_cos[...] * jnp.sin(t_pos))
        dpts_ref[...] = jax.lax.dot_general(
            d_tpos, pos_P[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d_tdir = d_denc.astype(jnp.float32) * (
            dir_id[...] + dir_sin[...] * jnp.cos(t_dir)
            - dir_cos[...] * jnp.sin(t_dir))
        ddirs_ref[...] = jax.lax.dot_general(
            d_tdir, dir_P[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        contribs = []
        for i in range(n_layers):
            contribs += [trunk_w_grads[i], trunk_b_grads[i]]
        contribs += [dWs, dbs, dWf, dbf, (dWd_top, dWd_bot), dbd, dWr, dbr]
        for r, c in zip(acc_refs, contribs):
            if isinstance(c, tuple):
                top, bot = c
                r[:top.shape[0], :] += top
                r[top.shape[0]:, :] += bot
            else:
                r[...] += c

    return kernel


def _fused_backward(params, pts2d, dirs2d, grgb2d, gsig2d,
                    cfg: ModelConfig, dtype_str: str,
                    interpret: Optional[bool] = None,
                    h_list=None):
    """(N,3)/(N,3)/(N,3)/(N,1) padded inputs -> (packed dW list, d_pts, d_dirs).

    With `h_list` (store mode), the trunk activations written by the
    store-mode forward are fed as input tiles and the kernel skips the
    trunk recompute; inputs are then padded to the forward's TILE, and the
    backward tile must divide it (TILE_BWD when it does, else the safe
    512). Without it, N % TILE_BWD == 0."""
    if interpret is None:
        interpret = _interpret_default()
    n = pts2d.shape[0]
    stored = h_list is not None
    if stored:
        tile = TILE_BWD if TILE % TILE_BWD == 0 else 512
    else:
        tile = TILE_BWD
    compute_dtype = jnp.dtype(dtype_str)
    weights, S_pos, S_dir = _prepare_weights(params, cfg, compute_dtype)
    pos_tabs = _encoding_tables(cfg.pos_freqs, S_pos)
    dir_tabs = _encoding_tables(cfg.dir_freqs, S_dir)
    tabs = [jnp.asarray(t) for t in (*pos_tabs, *dir_tabs)]
    n_tiles = n // tile
    H = cfg.hidden_dim

    tile_spec = lambda width: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    h_specs = [tile_spec(H) for _ in (h_list or ())]
    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[tile_spec(3), tile_spec(3), tile_spec(3), tile_spec(1)]
        + [_const_spec(t.shape) for t in tabs]
        + h_specs
        + [_const_spec(wt.shape) for wt in weights],
        out_specs=[tile_spec(3), tile_spec(3)]
        + [_const_spec(wt.shape) for wt in weights],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n, 3), jnp.float32),
        jax.ShapeDtypeStruct((n, 3), jnp.float32),
    ] + [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in weights]

    outs = pl.pallas_call(
        _make_bwd_kernel(cfg, compute_dtype, len(weights), stored=stored),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(pts2d, dirs2d, grgb2d, gsig2d, *tabs, *(h_list or ()), *weights)
    return outs[2:], outs[0], outs[1]


def _unpack_weight_grads(dws, cfg: ModelConfig, S_pos: int, S_dir: int):
    """Inverse of _prepare_weights: strip padded encoding rows and restore
    the params-pytree layout (padding rows carry exactly-zero grads since
    the padded encoding slots are exactly zero)."""
    pos_dim = 3 * (1 + 2 * cfg.pos_freqs)
    dir_dim = 3 * (1 + 2 * cfg.dir_freqs)
    H = cfg.hidden_dim
    g = {}
    for i in range(cfg.num_hidden_layers):
        dw, db = dws[2 * i], dws[2 * i + 1]
        if i == 0:
            dw = dw[:pos_dim]
        elif (i - 1) in cfg.skips:
            dw = jnp.concatenate([dw[:pos_dim], dw[S_pos:]], axis=0)
        g[f"trunk_{i}_w"] = dw
        g[f"trunk_{i}_b"] = db.reshape(-1)
    idx = 2 * cfg.num_hidden_layers
    g["sigma_w"] = dws[idx]
    g["sigma_b"] = dws[idx + 1].reshape(-1)
    g["feat_w"] = dws[idx + 2]
    g["feat_b"] = dws[idx + 3].reshape(-1)
    dw_dir = dws[idx + 4]
    g["dir_w"] = jnp.concatenate([dw_dir[:H], dw_dir[H:H + dir_dim]], axis=0)
    g["dir_b"] = dws[idx + 5].reshape(-1)
    g["rgb_w"] = dws[idx + 6]
    g["rgb_b"] = dws[idx + 7].reshape(-1)
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_with_grad(params, pts, viewdirs, cfg, dtype_str):
    batch_shape = pts.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    pad = (-n) % TILE
    pts2d = jnp.pad(pts.reshape(-1, 3), ((0, pad), (0, 0)))
    dirs2d = jnp.pad(viewdirs.reshape(-1, 3), ((0, pad), (0, 0)))
    rgb, sigma = _fused_forward(params, pts2d, dirs2d, cfg, dtype_str)
    return (
        rgb[:n].reshape(batch_shape + (3,)),
        sigma[:n].reshape(batch_shape + (1,)),
    )


def _store_mode() -> bool:
    """ROBUST_NERF_PALLAS_STORE=1: the forward streams the 8 trunk
    activations to HBM (bf16) and the backward reads them instead of
    recomputing the trunk per tile — the same store-vs-recompute tradeoff
    XLA's autodiff makes, inside the fused kernels."""
    return (os.environ.get("ROBUST_NERF_PALLAS_STORE", "0") == "1"
            and os.environ.get("ROBUST_NERF_PALLAS_BWD", "1") == "1")


def _fused_fwd(params, pts, viewdirs, cfg, dtype_str):
    if _store_mode():
        batch_shape = pts.shape[:-1]
        n = int(np.prod(batch_shape)) if batch_shape else 1
        # Hard gate (VERDICT r3 #5): the store-mode kernel pair
        # deterministically exceeds this environment's remote compile
        # helper capacity above ~32k points per call (ray batch >= 1024 at
        # 32+32 samples) — the failure presents as tpu_compile_helper
        # HTTP 500 / exit 1 after minutes, indistinguishable from a hang.
        # Fail fast with the remedy instead.
        max_pts = int(os.environ.get("ROBUST_NERF_PALLAS_STORE_MAX_PTS",
                                     "32768"))
        if n > max_pts:
            raise RuntimeError(
                f"ROBUST_NERF_PALLAS_STORE=1 with {n} points per call "
                f"(> {max_pts}): the store-mode fused-kernel pair exceeds "
                "the remote TPU compile helper's capacity at this size "
                "(deterministic tpu_compile_helper failure, see CLAUDE.md)."
                " Use a smaller ray batch / microbatch, unset "
                "ROBUST_NERF_PALLAS_STORE (recompute backward), or raise "
                "ROBUST_NERF_PALLAS_STORE_MAX_PTS if your toolchain "
                "compiles larger programs."
            )
        pad = (-n) % TILE
        # f32 tiles: bf16 pts/dirs (the train step samples in the compute
        # dtype) crash the Mosaic compile of the store-mode kernel pair
        # (remote compile helper exit 1, measured); the upcast is exact
        # and the HIGHEST-precision encoding wants f32 anyway.
        pts2d = jnp.pad(pts.reshape(-1, 3).astype(jnp.float32),
                        ((0, pad), (0, 0)))
        dirs2d = jnp.pad(viewdirs.reshape(-1, 3).astype(jnp.float32),
                         ((0, pad), (0, 0)))
        rgb, sigma, h_list = _fused_forward(
            params, pts2d, dirs2d, cfg, dtype_str, store_acts=True
        )
        out = (
            rgb[:n].reshape(batch_shape + (3,)),
            sigma[:n].reshape(batch_shape + (1,)),
        )
        return out, (params, pts, viewdirs, h_list)
    out = _fused_with_grad(params, pts, viewdirs, cfg, dtype_str)
    return out, (params, pts, viewdirs, None)


def _fused_bwd(cfg, dtype_str, residuals, cotangents):
    params, pts, viewdirs, h_list = residuals
    if os.environ.get("ROBUST_NERF_PALLAS_BWD", "1") != "1":
        # XLA-recompute fallback (exact gradients of the same math) — kept
        # for A/B measurement and as an escape hatch.
        _, vjp_fn = jax.vjp(
            lambda p, x, d: nerf_apply(p, x, d, cfg, jnp.dtype(dtype_str)),
            params, pts, viewdirs,
        )
        return vjp_fn(cotangents)

    g_rgb, g_sigma = cotangents
    batch_shape = pts.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    # store mode: the activation arrays are padded to the forward's TILE,
    # so every backward input must pad to the same N; f32 tiles for the
    # same Mosaic-compile reason as in _fused_fwd's store branch
    pad = (-n) % (TILE if h_list is not None else TILE_BWD)
    in_dt = jnp.float32 if h_list is not None else pts.dtype
    pts2d = jnp.pad(pts.reshape(-1, 3).astype(in_dt), ((0, pad), (0, 0)))
    dirs2d = jnp.pad(viewdirs.reshape(-1, 3).astype(in_dt),
                     ((0, pad), (0, 0)))
    # zero-padded cotangents contribute exactly zero to every dW/db
    grgb2d = jnp.pad(g_rgb.reshape(-1, 3).astype(jnp.float32),
                     ((0, pad), (0, 0)))
    gsig2d = jnp.pad(g_sigma.reshape(-1, 1).astype(jnp.float32),
                     ((0, pad), (0, 0)))
    dws, d_pts, d_dirs = _fused_backward(
        params, pts2d, dirs2d, grgb2d, gsig2d, cfg, dtype_str,
        h_list=h_list,
    )
    S_pos = _round_up(3 * (1 + 2 * cfg.pos_freqs), 64)
    S_dir = _round_up(3 * (1 + 2 * cfg.dir_freqs), 32)
    d_params = _unpack_weight_grads(dws, cfg, S_pos, S_dir)
    return (
        d_params,
        d_pts[:n].reshape(batch_shape + (3,)),
        d_dirs[:n].reshape(batch_shape + (3,)),
    )


_fused_with_grad.defvjp(_fused_fwd, _fused_bwd)


def nerf_apply_fused(
    params,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    cfg: ModelConfig,
    compute_dtype=jnp.float32,
    anneal_alpha=None,
):
    """Drop-in replacement for models.nerf.nerf_apply backed by the fused
    Pallas kernel (XLA fallback for unsupported configs; frequency
    annealing is an early-training transient, served by the XLA path)."""
    if not supports(cfg) or viewdirs is None or anneal_alpha is not None:
        return nerf_apply(params, pts, viewdirs, cfg, compute_dtype,
                          anneal_alpha)
    return _fused_with_grad(params, pts, viewdirs, cfg,
                            jnp.dtype(compute_dtype).name)
