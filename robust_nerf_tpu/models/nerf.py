"""NeRF MLP as a functional param pytree — no module system, pure jnp.

Architecture parity with the reference (noisy_src/model.py:20-221):
frequency positional encoding (include-input, log-spaced bands), an
8x256 trunk with a skip-concat of the encoded position after layer 4,
a ReLU sigma head, and a view-conditioned 128-wide color head with
sigmoid RGB. Parameters live in a flat dict-of-arrays pytree so the whole
model threads through jit/grad/shard_map; matmuls are MXU-shaped
(256/128-wide) and can run in bfloat16 with float32 accumulation.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig

Params = Dict[str, jnp.ndarray]

# A/B knob: evaluate the sigma and feature heads as ONE concatenated matmul
# (same math; saves one dispatch + one read of the trunk output per eval).
_FUSE_HEADS = os.environ.get("ROBUST_NERF_FUSE_HEADS", "0") == "1"


def freq_anneal_weights(num_freqs: int, alpha) -> jnp.ndarray:
    """BARF-style coarse-to-fine band weights, shape (L,).

    w_k(alpha) = 0 for alpha <= k, 1 for alpha >= k+1, cosine-eased between.
    alpha in [0, L] is the annealing progress (alpha = L -> all bands on).
    Gating high-frequency bands early keeps the photometric loss smooth in
    the camera poses, which is what lets joint pose optimization escape the
    'scene deforms to explain wrong poses' local minimum.
    """
    k = jnp.arange(num_freqs, dtype=jnp.float32)
    t = jnp.clip(alpha - k, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * t))


def positional_encoding(
    x: jnp.ndarray, num_freqs: int, include_input: bool = True, alpha=None
):
    """gamma(x) = [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{L-1} x), cos(2^{L-1} x)].

    Reference semantics: noisy_src/model.py:20-80 (log-spaced bands, input
    included first). Output dim per channel = 2L+1. `alpha` optionally
    applies BARF frequency annealing (None = all bands, reference behavior).
    """
    out = [x] if include_input else []
    # One broadcasted multiply instead of a per-frequency Python loop:
    # (..., C) x (L,) -> (..., L, C) -> interleave sin/cos per frequency.
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xf = x[..., None, :] * freqs[:, None]                 # (..., L, C)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    sc = jnp.stack([sin, cos], axis=-2)                   # (..., L, 2, C)
    if alpha is not None:
        w = freq_anneal_weights(num_freqs, alpha).astype(x.dtype)
        sc = sc * w[:, None, None]
    sc = sc.reshape(x.shape[:-1] + (2 * num_freqs * x.shape[-1],))
    out.append(sc)
    return jnp.concatenate(out, axis=-1)


def posenc_output_dim(num_freqs: int, include_input: bool = True) -> int:
    return 2 * num_freqs + (1 if include_input else 0)


def _linear_init(key, in_dim: int, out_dim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias — the
    effective distribution of torch.nn.Linear's default init, so convergence
    behavior tracks the reference without copying any code."""
    bound = 1.0 / math.sqrt(in_dim)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (in_dim, out_dim), jnp.float32, -bound, bound)
    b = jax.random.uniform(bkey, (out_dim,), jnp.float32, -bound, bound)
    return w, b


def init_nerf_params(key: jax.Array, cfg: Optional[ModelConfig] = None) -> Params:
    """Initialize one NeRF MLP's parameters as a flat dict pytree."""
    if cfg is None:
        cfg = ModelConfig()
    pos_dim = 3 * posenc_output_dim(cfg.pos_freqs)
    dir_dim = 3 * posenc_output_dim(cfg.dir_freqs)

    params: Params = {}
    keys = jax.random.split(key, cfg.num_hidden_layers + 4)
    in_dim = pos_dim
    for i in range(cfg.num_hidden_layers):
        w, b = _linear_init(keys[i], in_dim, cfg.hidden_dim)
        params[f"trunk_{i}_w"] = w
        params[f"trunk_{i}_b"] = b
        in_dim = cfg.hidden_dim
        if i in cfg.skips:
            in_dim += pos_dim

    # in_dim now holds the trunk's OUTPUT dim — hidden_dim, plus pos_dim
    # when the last layer index is in skips (nerf_apply concatenates after
    # every skip layer, including a trailing one)
    k = cfg.num_hidden_layers
    params["sigma_w"], params["sigma_b"] = _linear_init(keys[k], in_dim, 1)
    params["feat_w"], params["feat_b"] = _linear_init(
        keys[k + 1], in_dim, cfg.hidden_dim
    )
    color_in = cfg.hidden_dim + (dir_dim if cfg.use_view_dirs else 0)
    params["dir_w"], params["dir_b"] = _linear_init(
        keys[k + 2], color_in, cfg.hidden_dim // 2
    )
    params["rgb_w"], params["rgb_b"] = _linear_init(
        keys[k + 3], cfg.hidden_dim // 2, 3
    )
    return params


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def _matmul(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, dtype) -> jnp.ndarray:
    """MXU matmul in the compute dtype with float32 accumulation.

    The result is cast back to `dtype`: with bfloat16 that halves the HBM
    footprint of every stored activation (the training step is
    activation-bandwidth-bound at 192 samples/ray), while accumulation and
    the bias add stay in float32.
    """
    y = jnp.dot(h.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)
    return (y + b).astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _matrelu(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, dtype) -> jnp.ndarray:
    """relu(h @ w + b) that materializes ONLY the post-ReLU output.

    Under plain autodiff `jax.nn.relu(_matmul(...))` makes XLA store two
    (..., H) tensors per trunk layer: the pre-activation (relu's VJP masks
    on input > 0) AND the post-activation (the next layer's matmul
    residual). The step is HBM-bandwidth-bound (measured 21.9 GB/step at
    91% of the v5e roofline, DESIGN.md round 3), so that duplicate write
    +read is pure waste. ReLU's mask is equally recoverable from the
    OUTPUT (y > 0 iff relu(y) > 0 — exact, ReLU is identity on the kept
    side), so this custom VJP saves (h, w, post) where `post` is shared
    with the next layer's residual and the pre-activation buffer never
    exists. Forward math is bit-identical to _matmul + relu.
    """
    y = jnp.dot(h.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)
    return jnp.maximum(y + b, 0.0).astype(dtype)


def _matrelu_fwd(h, w, b, dtype):
    out = _matrelu(h, w, b, dtype)
    return out, (h, w, out, jnp.zeros((0,), b.dtype))


def _matrelu_bwd_math(mask, h, w, g, cdt, h_dtype, b_dtype):
    """Shared backward for the fused matmul+ReLU VJPs: mask the upstream
    grad with the ReLU mask, then dh = gm @ w.T, dw = h^T @ gm,
    db = sum(gm) — all contracted in `cdt` with float32 accumulation."""
    gm = jnp.where(mask, g.astype(jnp.float32), 0.0).astype(cdt)
    gm2 = gm.reshape(-1, gm.shape[-1])
    h2 = h.reshape(-1, h.shape[-1]).astype(cdt)
    dh = jnp.dot(
        gm2, w.astype(cdt).T, preferred_element_type=jnp.float32
    ).reshape(g.shape[:-1] + (w.shape[0],)).astype(h_dtype)
    dw = jax.lax.dot_general(
        h2, gm2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    db = jnp.sum(gm2, axis=0, dtype=jnp.float32).astype(b_dtype)
    return dh, dw, db


def _matrelu_bwd(dtype, res, g):
    h, w, out, b_tok = res
    return _matrelu_bwd_math(out > 0, h, w, g, dtype, h.dtype, b_tok.dtype)


_matrelu.defvjp(_matrelu_fwd, _matrelu_bwd)


@jax.custom_vjp
def _matrelu_f8(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """relu(h @ w + b) whose backward reads the INPUT from a float8_e4m3
    copy. The training step is activation-bandwidth-bound (DESIGN.md step
    ablation); storing trunk residuals at 1 byte/elem instead of 2 halves
    that traffic. Forward math is identical to _matmul+relu; only the dW
    contraction sees the quantized activations (e4m3 saturates at 448 —
    far above trunk activation range). Opt-in via TPUConfig.f8_residuals."""
    y = jnp.dot(h, w.astype(h.dtype), preferred_element_type=jnp.float32) + b
    return jnp.maximum(y, 0.0).astype(h.dtype)


def _matrelu_f8_fwd(h, w, b):
    y = _matrelu_f8(h, w, b)
    # residuals: f8 input copy + relu mask (+ zero-size dtype token so the
    # backward can restore h's original dtype without static aux)
    return y, (h.astype(jnp.float8_e4m3fn), w, y > 0,
               jnp.zeros((0,), h.dtype), jnp.zeros((0,), b.dtype))


def _matrelu_f8_bwd(res, g):
    h8, w, mask, h_tok, b_tok = res
    return _matrelu_bwd_math(
        mask, h8, w, g, jnp.bfloat16, h_tok.dtype, b_tok.dtype
    )


_matrelu_f8.defvjp(_matrelu_f8_fwd, _matrelu_f8_bwd)


def nerf_apply(
    params: Params,
    pts: jnp.ndarray,                  # (..., 3) world-space positions
    viewdirs: Optional[jnp.ndarray],   # (..., 3) unit view directions or None
    cfg: ModelConfig,
    compute_dtype=jnp.float32,
    anneal_alpha=None,                 # BARF progress in [0, pos_freqs]; None = off
    f8_residuals: bool = False,        # trunk backward reads f8 activations
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the MLP. Returns (rgb in [0,1] (..., 3), sigma >= 0 (..., 1)).

    Reference semantics: noisy_src/model.py:145-196 — skip-concat of the
    encoded position after trunk layers in cfg.skips, ReLU sigma, sigmoid RGB.
    """
    # Encoding is computed in f32 (sin at 2^{L-1}*x needs full precision)
    # and stored in the compute dtype like every other activation.
    x_enc = positional_encoding(
        pts, cfg.pos_freqs, alpha=anneal_alpha
    ).astype(compute_dtype)
    h = x_enc
    for i in range(cfg.num_hidden_layers):
        if f8_residuals:
            h = _matrelu_f8(h, params[f"trunk_{i}_w"], params[f"trunk_{i}_b"])
        else:
            h = _matrelu(
                h, params[f"trunk_{i}_w"], params[f"trunk_{i}_b"],
                jnp.dtype(compute_dtype),
            )
        if i in cfg.skips:
            h = jnp.concatenate([x_enc, h], axis=-1)

    if _FUSE_HEADS:
        # One (H, 1+hidden) matmul instead of separate sigma/feat heads:
        # identical math (concat on the N dim), one fewer read of `h` and
        # one fewer dispatch. MXU padded-tile count is unchanged
        # (1+256 -> 3 x 128-lane tiles = 1 + 2), so this targets dispatch/
        # bandwidth overhead only — A/B knob, see DESIGN.md ledger.
        sf = _matmul(
            h,
            jnp.concatenate([params["sigma_w"], params["feat_w"]], axis=1),
            jnp.concatenate([params["sigma_b"], params["feat_b"]], axis=0),
            compute_dtype,
        )
        raw_sigma = sf[..., :1].astype(jnp.float32)
        feats = sf[..., 1:]
    else:
        raw_sigma = _matmul(
            h, params["sigma_w"], params["sigma_b"], compute_dtype
        ).astype(jnp.float32)
        feats = _matmul(h, params["feat_w"], params["feat_b"], compute_dtype)
    if cfg.sigma_activation == "softplus":
        sigma = jax.nn.softplus(raw_sigma)
    else:
        sigma = jax.nn.relu(raw_sigma)

    if cfg.use_view_dirs and viewdirs is not None:
        alpha_dir = (
            None
            if anneal_alpha is None
            else anneal_alpha * (cfg.dir_freqs / cfg.pos_freqs)
        )
        d_enc = positional_encoding(
            viewdirs, cfg.dir_freqs, alpha=alpha_dir
        ).astype(compute_dtype)
        h_color = jnp.concatenate([feats, d_enc], axis=-1)
    else:
        h_color = feats
    h_color = _matrelu(
        h_color, params["dir_w"], params["dir_b"], jnp.dtype(compute_dtype)
    )
    rgb = jax.nn.sigmoid(
        _matmul(h_color, params["rgb_w"], params["rgb_b"], compute_dtype)
        .astype(jnp.float32)
    )
    return rgb, sigma


def model_apply_fn(cfg: Optional[ModelConfig] = None):
    """The apply fn for cfg.architecture ("mlp" -> nerf_apply,
    "hashgrid" -> models/hashgrid.py). All apply fns share one signature:
    (params, pts, viewdirs, cfg, compute_dtype, anneal_alpha[, f8_residuals])."""
    if cfg is not None and getattr(cfg, "architecture", "mlp") == "hashgrid":
        from .hashgrid import hashgrid_apply

        return hashgrid_apply
    return nerf_apply


def create_nerf(
    key: jax.Array, cfg: Optional[ModelConfig] = None, use_hierarchical: bool = True
) -> Dict[str, Params]:
    """Independent coarse (+ fine) parameter trees for cfg.architecture.

    Reference semantics for the "mlp" family: noisy_src/model.py:199-221.
    The "hashgrid" family keeps the same coarse/fine structure so
    hierarchical sampling, checkpoints, and sharding treat both alike.
    """
    if cfg is None:
        cfg = ModelConfig()
    if getattr(cfg, "architecture", "mlp") == "hashgrid":
        from .hashgrid import init_hashgrid_params as init_fn
    else:
        init_fn = init_nerf_params
    kc, kf = jax.random.split(key)
    models = {"coarse": init_fn(kc, cfg)}
    if use_hierarchical:
        models["fine"] = init_fn(kf, cfg)
    return models
