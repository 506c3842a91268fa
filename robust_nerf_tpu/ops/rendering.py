"""Volume rendering — one jitted coarse-to-fine program per ray tile.

The reference renders through a Python chunk loop and materializes every
intermediate in device memory (noisy_src/rendering.py:243-323). Here the
entire coarse->hierarchical->fine chain is a single traced function with
static shapes; full-frame rendering is `lax.map` over fixed-size ray tiles
so eval compiles once and stays on-device end to end.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, RenderConfig, TPUConfig
from ..core.rays import sample_along_rays, sample_hierarchical
from ..models.nerf import model_apply_fn, nerf_apply


def resolve_fused_resample(setting: str) -> Optional[bool]:
    """TPUConfig.fused_resample "on"/"off"/"auto" -> True/False/None."""
    return {"on": True, "off": False}.get(setting, None)


def raw2outputs(
    rgb: jnp.ndarray,        # (..., S, 3) raw colors
    sigma: jnp.ndarray,      # (..., S) or (..., S, 1) densities
    z_vals: jnp.ndarray,     # (..., S)
    rays_d: jnp.ndarray,     # (..., 3)
    key: Optional[jax.Array] = None,
    raw_noise_std: float = 0.0,
    white_background: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Composite raw network outputs along rays.

    Reference semantics: noisy_src/rendering.py:20-116 — 1e10 tail distance
    scaled by |rays_d|, alpha = 1-exp(-relu(sigma)*delta), transmittance via
    1-prepended cumprod with +1e-10, white-background composite.
    """
    if sigma.shape[-1] == 1 and sigma.ndim == z_vals.ndim + 1:
        sigma = sigma[..., 0]

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if raw_noise_std > 0.0:
        sigma = sigma + jax.random.normal(key, sigma.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    transmittance = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    weights = alpha * transmittance

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    if white_background:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {
        "rgb_map": rgb_map,
        "depth_map": depth_map,
        "acc_map": acc_map,
        "weights": weights,
    }


def render_rays(
    models: Dict[str, dict],           # {"coarse": params, "fine": params}
    rays_o: jnp.ndarray,               # (N, 3)
    rays_d: jnp.ndarray,               # (N, 3)
    key: Optional[jax.Array],
    render_cfg: RenderConfig,
    model_cfg: ModelConfig,
    is_train: bool = True,
    compute_dtype=jnp.float32,
    apply_fn=None,
    anneal_alpha=None,
    fused_resample: Optional[bool] = None,
) -> Dict[str, jnp.ndarray]:
    """Full coarse->fine render of one ray batch as a single traced program.

    Reference semantics: noisy_src/rendering.py:119-240 — train mode enables
    stratified jitter + density noise; eval uses deterministic hierarchical
    sampling (det = not is_train). `apply_fn` lets the Pallas fused-MLP path
    drop in without touching the pipeline (None = resolve from
    model_cfg.architecture). `fused_resample` routes the PDF inversion
    through the Pallas resample kernel (None = default off — see
    TPUConfig.fused_resample for the measurement).
    """
    if apply_fn is None:
        apply_fn = model_apply_fn(model_cfg)
    perturb = render_cfg.perturb and is_train
    raw_noise_std = render_cfg.raw_noise_std if is_train else 0.0
    if fused_resample is None:
        # default off: measured a wash vs XLA's fused reductions inside the
        # training step on v5e (see TPUConfig.fused_resample)
        fused_resample = False

    if key is None:
        key = jax.random.PRNGKey(0)
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)

    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    pts_c, z_vals_c = sample_along_rays(
        k_strat, rays_o, rays_d,
        near=render_cfg.near, far=render_cfg.far,
        num_samples=render_cfg.num_samples, perturb=perturb,
    )
    vdirs_c = jnp.broadcast_to(viewdirs[:, None, :], pts_c.shape)
    rgb_c, sigma_c = apply_fn(
        models["coarse"], pts_c, vdirs_c, model_cfg, compute_dtype, anneal_alpha
    )
    out_c = raw2outputs(
        rgb_c, sigma_c, z_vals_c, rays_d,
        key=k_noise_c, raw_noise_std=raw_noise_std,
        white_background=render_cfg.white_background,
    )
    results = {
        "rgb_coarse": out_c["rgb_map"],
        "depth_coarse": out_c["depth_map"],
        "acc_coarse": out_c["acc_map"],
    }

    if render_cfg.use_hierarchical and "fine" in models:
        pts_f, z_vals_f = sample_hierarchical(
            k_pdf, rays_o, rays_d, z_vals_c, out_c["weights"],
            num_samples_fine=render_cfg.num_samples_fine, det=not is_train,
            use_fused=fused_resample,
        )
        vdirs_f = jnp.broadcast_to(viewdirs[:, None, :], pts_f.shape)
        rgb_f, sigma_f = apply_fn(
            models["fine"], pts_f, vdirs_f, model_cfg, compute_dtype, anneal_alpha
        )
        out_f = raw2outputs(
            rgb_f, sigma_f, z_vals_f, rays_d,
            key=k_noise_f, raw_noise_std=raw_noise_std,
            white_background=render_cfg.white_background,
        )
        results["rgb_fine"] = out_f["rgb_map"]
        results["depth_fine"] = out_f["depth_map"]
        results["acc_fine"] = out_f["acc_map"]

    return results


def render_rays_chunked(
    models: Dict[str, dict],
    rays_o: jnp.ndarray,               # (N, 3), N need not be tile-aligned
    rays_d: jnp.ndarray,
    key: Optional[jax.Array],
    render_cfg: RenderConfig,
    model_cfg: ModelConfig,
    is_train: bool = False,
    compute_dtype=jnp.float32,
    tile: int = 4096,
    apply_fn=None,
    fused_resample: Optional[bool] = None,
    render_fn=None,
) -> Dict[str, jnp.ndarray]:
    """Render arbitrarily many rays via lax.map over fixed-size tiles.

    TPU-native replacement for the reference's sequential Python chunk loop
    (noisy_src/rendering.py:299-322): pad to a tile multiple, scan tiles
    inside one jitted program, strip the padding.

    `render_fn(models, rays_o, rays_d, key) -> dict` overrides the per-tile
    renderer (default: `render_rays` with the remaining knobs) — the hook
    the grid-accelerated path (ops/occupancy.py) plugs into.
    """
    n = rays_o.shape[0]
    tile = min(tile, max(n, 1))
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    ro = jnp.pad(rays_o, ((0, pad), (0, 0))).reshape(n_tiles, tile, 3)
    rd = jnp.pad(
        rays_d, ((0, pad), (0, 0)), constant_values=1.0
    ).reshape(n_tiles, tile, 3)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, n_tiles)

    def render_tile(args):
        ro_t, rd_t, k_t = args
        if render_fn is not None:
            return render_fn(models, ro_t, rd_t, k_t)
        return render_rays(
            models, ro_t, rd_t, k_t, render_cfg, model_cfg,
            is_train=is_train, compute_dtype=compute_dtype, apply_fn=apply_fn,
            fused_resample=fused_resample,
        )

    out = jax.lax.map(render_tile, (ro, rd, keys))
    return {
        k: v.reshape((n_tiles * tile,) + v.shape[2:])[:n] for k, v in out.items()
    }


def _eval_apply_fn(model_cfg, tpu_cfg):
    from ..experimental.pallas import pallas_enabled

    if getattr(model_cfg, "architecture", "mlp") != "mlp":
        # Pallas fused kernels implement the frequency-MLP only; other
        # families resolve through the architecture dispatcher.
        return model_apply_fn(model_cfg)
    if pallas_enabled(tpu_cfg, context="eval"):
        from ..experimental.pallas.fused_mlp import nerf_apply_fused

        return nerf_apply_fused
    return nerf_apply


@partial(jax.jit, static_argnames=("H", "W", "render_cfg", "model_cfg", "tpu_cfg"))
def _render_image_jit(models, pose, H, W, focal, render_cfg, model_cfg, tpu_cfg):
    from ..core.rays import get_ray_directions, get_rays

    apply_fn = _eval_apply_fn(model_cfg, tpu_cfg)
    directions = get_ray_directions(H, W, focal)
    rays_o, rays_d = get_rays(directions, pose)
    out = render_rays_chunked(
        models,
        rays_o.reshape(-1, 3),
        rays_d.reshape(-1, 3),
        None,
        render_cfg,
        model_cfg,
        is_train=False,
        compute_dtype=jnp.dtype(tpu_cfg.compute_dtype),
        tile=tpu_cfg.eval_tile,
        apply_fn=apply_fn,
        fused_resample=resolve_fused_resample(tpu_cfg.fused_resample),
    )
    which = "fine" if "rgb_fine" in out else "coarse"
    return {
        "rgb": out[f"rgb_{which}"].reshape(H, W, 3),
        "depth": out[f"depth_{which}"].reshape(H, W),
        "acc": out[f"acc_{which}"].reshape(H, W),
    }


@partial(
    jax.jit,
    static_argnames=("H", "W", "render_cfg", "model_cfg", "tpu_cfg", "mesh"),
)
def _render_image_sharded_jit(
    models, pose, H, W, focal, render_cfg, model_cfg, tpu_cfg, mesh
):
    """Frame render SPMD-sharded over the mesh's data axis.

    The reference renders eval frames on its one device
    (noisy_src/train.py:122-160); here the H*W rays are split across all
    chips via shard_map (rays are embarrassingly parallel, params are
    replicated) so full-frame eval/serving scales ~linearly with mesh size.
    """
    from jax.sharding import PartitionSpec as P

    from ..core.rays import get_ray_directions, get_rays
    from ..parallel.mesh import DATA_AXIS, pad_to_multiple

    apply_fn = _eval_apply_fn(model_cfg, tpu_cfg)
    directions = get_ray_directions(H, W, focal)
    rays_o, rays_d = get_rays(directions, pose)
    n = H * W
    n_dev = int(mesh.devices.size)
    tile = min(tpu_cfg.eval_tile, max(n // n_dev, 1))
    # pad so every device gets a tile-aligned slice of rays
    n_pad = pad_to_multiple(n, n_dev * tile)
    ro = jnp.pad(rays_o.reshape(-1, 3), ((0, n_pad - n), (0, 0)))
    rd = jnp.pad(
        rays_d.reshape(-1, 3), ((0, n_pad - n), (0, 0)), constant_values=1.0
    )

    def render_local(models_l, ro_l, rd_l):
        return render_rays_chunked(
            models_l, ro_l, rd_l, None, render_cfg, model_cfg,
            is_train=False,
            compute_dtype=jnp.dtype(tpu_cfg.compute_dtype),
            tile=tile, apply_fn=apply_fn,
            fused_resample=resolve_fused_resample(tpu_cfg.fused_resample),
        )

    out = jax.shard_map(
        render_local, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )(models, ro, rd)
    which = "fine" if "rgb_fine" in out else "coarse"
    # gather the (small) frame to replicated so hosts can fetch it even
    # when the mesh spans multiple processes
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    return {
        k: jax.lax.with_sharding_constraint(v[:n].reshape(shp), rep)
        for k, v, shp in (
            ("rgb", out[f"rgb_{which}"], (H, W, 3)),
            ("depth", out[f"depth_{which}"], (H, W)),
            ("acc", out[f"acc_{which}"], (H, W)),
        )
    }


def render_image(
    models,
    pose: jnp.ndarray,
    H: int,
    W: int,
    focal: float,
    render_cfg: RenderConfig,
    model_cfg: ModelConfig,
    tpu_cfg: Optional[TPUConfig] = None,
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Render a full H x W frame from one pose (eval path).

    Reference semantics: noisy_src/train.py:122-160, but jit-compiled once
    per (H, W, config) and tiled on-device instead of Python-chunked.
    With `mesh` (>1 device), rays are sharded across the data axis and the
    frame renders D-way parallel (models must be replicated on the mesh).
    """
    if tpu_cfg is None:
        tpu_cfg = TPUConfig()
    pose = jnp.asarray(pose, jnp.float32)
    if mesh is not None and int(mesh.devices.size) > 1:
        return _render_image_sharded_jit(
            models, pose, H, W, float(focal), render_cfg, model_cfg,
            tpu_cfg, mesh,
        )
    return _render_image_jit(
        models, pose, H, W, float(focal), render_cfg, model_cfg, tpu_cfg
    )
