"""AOT serving export — the compiled render path as a portable artifact.

The reference has no deployment story: serving means reconstructing the
whole Python framework from a checkpoint and re-tracing the renderer
(noisy_src/inference.py:33-72). On TPU the natural deployment unit is the
compiled program itself: `jax.export` serializes the jitted tile renderer
(StableHLO + calling convention) so a serving process can deserialize and
call it with NOTHING but jax installed — none of this package's Python —
and the artifact can be lowered for several platforms (tpu + cpu) at
export time.

Artifact layout (a directory):

    renderer.jaxexport   serialized Exported. Two kinds (meta.json "kind"):
                         tile  — call(params, rays_o, rays_d), rays (tile, 3)
                                 float32; returns the render_rays dict.
                         frame — call(params, pose_4x4, focal); ray gen +
                                 lax.map tiling run INSIDE the program; one
                                 dispatch renders a whole frame to
                                 {rgb (H,W,3), depth (H,W), acc (H,W)}.
                         `params` is always a flat TUPLE of arrays (leaf
                         order below).
    params.npz           leaf_00000..N arrays in calling-convention order.
    meta.json            tile, platforms, dtypes, config dicts, jax
                         version, leaf names — everything needed to drive
                         the artifact blind.

A minimal pure-JAX consumer:

    from jax import export
    import numpy as np
    exp = export.deserialize((d / "renderer.jaxexport").read_bytes())
    z = np.load(d / "params.npz")
    params = tuple(z[k] for k in sorted(z.files))
    out = exp.call(params, rays_o, rays_d)       # dict of maps

The exported function takes params as arguments (not baked constants), so
one artifact serves every checkpoint of the same architecture: swap the
npz, keep the compiled program.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, RenderConfig, config_to_dict
from ..models.nerf import nerf_apply
from ..ops.rendering import render_rays, render_rays_chunked

ARTIFACT_VERSION = 1
_EXPORT_FILE = "renderer.jaxexport"
_PARAMS_FILE = "params.npz"
_META_FILE = "meta.json"

# jax.export only accepts canonical platform names; the axon tunnel
# backend lowers through the TPU pipeline.
_PLATFORM_ALIASES = {"axon": "tpu"}


def default_platforms() -> Tuple[str, ...]:
    """Current backend's canonical export platform, plus cpu so the
    artifact can always be smoke-tested host-side."""
    plat = jax.devices()[0].platform
    plat = _PLATFORM_ALIASES.get(plat, plat)
    return (plat, "cpu") if plat != "cpu" else ("cpu",)


def export_tile_renderer(
    models: Dict[str, dict],
    model_cfg: ModelConfig,
    render_cfg: RenderConfig,
    *,
    tile: int = 256,
    compute_dtype: str = "float32",
    platforms: Optional[Sequence[str]] = None,
):
    """Export the deterministic eval-time render of one (tile, 3) ray block.

    Eval rendering is deterministic (no stratified jitter, det hierarchical
    inversion, no density noise — reference eval semantics,
    noisy_src/rendering.py:161-162), so the exported function needs no RNG
    argument. Params are passed as a flat tuple so consumers never need
    this package's pytree structure. Returns the jax.export Exported.
    """
    leaves, treedef = jax.tree_util.tree_flatten(models)
    dtype = jnp.dtype(compute_dtype)

    def tile_fn(params: Tuple[jnp.ndarray, ...], rays_o, rays_d):
        mdl = jax.tree_util.tree_unflatten(treedef, list(params))
        return render_rays(
            mdl, rays_o, rays_d, None, render_cfg, model_cfg,
            is_train=False, compute_dtype=dtype, apply_fn=nerf_apply,
        )

    from jax import export as jexport

    ro = jax.ShapeDtypeStruct((tile, 3), jnp.float32)
    rd = jax.ShapeDtypeStruct((tile, 3), jnp.float32)
    arg_leaves = tuple(
        jax.ShapeDtypeStruct(leaf.shape, leaf.dtype) for leaf in leaves
    )
    platforms = tuple(platforms) if platforms else default_platforms()
    return jexport.export(jax.jit(tile_fn), platforms=platforms)(
        arg_leaves, ro, rd
    )


def export_frame_renderer(
    models: Dict[str, dict],
    model_cfg: ModelConfig,
    render_cfg: RenderConfig,
    H: int,
    W: int,
    *,
    tile: int = 256,
    compute_dtype: str = "float32",
    platforms: Optional[Sequence[str]] = None,
):
    """Export a FULL-FRAME renderer: call(params, pose, focal) ->
    {rgb (H, W, 3), depth (H, W), acc (H, W)} of the finest pass.

    The serving unit is one dispatch per frame — ray generation and the
    lax.map tiling live INSIDE the compiled program, so there is no host
    tile loop (unlike the tile artifact, whose consumer drives tiles).
    Camera pose (4, 4) and focal are runtime arguments: one artifact
    renders any viewpoint/zoom at the baked resolution.
    """
    from ..core.rays import get_ray_directions, get_rays

    leaves, treedef = jax.tree_util.tree_flatten(models)
    dtype = jnp.dtype(compute_dtype)

    def frame_fn(params: Tuple[jnp.ndarray, ...], pose, focal):
        mdl = jax.tree_util.tree_unflatten(treedef, list(params))
        dirs = get_ray_directions(H, W, focal)
        rays_o, rays_d = get_rays(dirs, pose)
        out = render_rays_chunked(
            mdl, rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), None,
            render_cfg, model_cfg, is_train=False, compute_dtype=dtype,
            tile=tile, apply_fn=nerf_apply,
        )
        # serving payload: only the finest pass's maps — the coarse maps
        # are DCE'd by XLA and never cross the device->host boundary
        # (895 -> 668 ms/frame over the tunnel vs returning all six maps;
        # at 668 ms the artifact is bit-identical to and exactly as fast
        # as the in-process jit eval path — results/serving/SERVING.md)
        which = "fine" if "rgb_fine" in out else "coarse"
        return {
            "rgb": out[f"rgb_{which}"].reshape(H, W, 3),
            "depth": out[f"depth_{which}"].reshape(H, W),
            "acc": out[f"acc_{which}"].reshape(H, W),
        }

    from jax import export as jexport

    arg_leaves = tuple(
        jax.ShapeDtypeStruct(leaf.shape, leaf.dtype) for leaf in leaves
    )
    pose = jax.ShapeDtypeStruct((4, 4), jnp.float32)
    focal = jax.ShapeDtypeStruct((), jnp.float32)
    platforms = tuple(platforms) if platforms else default_platforms()
    return jexport.export(jax.jit(frame_fn), platforms=platforms)(
        arg_leaves, pose, focal
    )


def save_serving_artifact(
    out_dir,
    models: Dict[str, dict],
    model_cfg: ModelConfig,
    render_cfg: RenderConfig,
    *,
    tile: int = 256,
    compute_dtype: str = "float32",
    platforms: Optional[Sequence[str]] = None,
    frame: Optional[Tuple[int, int]] = None,
) -> Path:
    """Export + write the three-file serving artifact; returns the dir.

    frame=(H, W) exports the full-frame renderer (call(params, pose,
    focal) -> (H, W, ...) maps) instead of the tile renderer.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if frame is not None:
        exported = export_frame_renderer(
            models, model_cfg, render_cfg, frame[0], frame[1],
            tile=tile, compute_dtype=compute_dtype, platforms=platforms,
        )
    else:
        exported = export_tile_renderer(
            models, model_cfg, render_cfg,
            tile=tile, compute_dtype=compute_dtype, platforms=platforms,
        )
    (out_dir / _EXPORT_FILE).write_bytes(exported.serialize())

    leaves, _ = jax.tree_util.tree_flatten(models)
    names = [f"leaf_{i:05d}" for i in range(len(leaves))]
    np.savez(
        out_dir / _PARAMS_FILE,
        **{n: np.asarray(leaf) for n, leaf in zip(names, leaves)},
    )

    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "kind": "frame" if frame is not None else "tile",
        "tile": tile,
        "frame": list(frame) if frame is not None else None,
        "platforms": list(exported.platforms),
        "compute_dtype": compute_dtype,
        "jax_version": jax.__version__,
        "model_config": config_to_dict(model_cfg),
        "render_config": config_to_dict(render_cfg),
        "num_leaves": len(leaves),
        "leaf_names": names,
        "calling_convention": (
            "call(params_tuple, pose_4x4, focal) -> {rgb, depth, acc}"
            if frame is not None
            else "call(params_tuple, rays_o, rays_d) -> dict"
        ),
    }
    (out_dir / _META_FILE).write_text(json.dumps(meta, indent=2))
    return out_dir


@dataclasses.dataclass
class ServingRenderer:
    """A loaded artifact: pads arbitrary ray counts to the exported tile and
    invokes the deserialized executable per tile (host loop — the tile
    program itself is the AOT unit)."""

    exported: object            # jax.export Exported
    params: Tuple[np.ndarray, ...]
    meta: dict

    @property
    def tile(self) -> int:
        return int(self.meta["tile"])

    @property
    def kind(self) -> str:
        return self.meta.get("kind", "tile")

    def render_frame(self, pose, focal) -> Dict[str, np.ndarray]:
        """Frame-kind artifacts: one compiled call per (pose, focal)."""
        if self.kind != "frame":
            raise ValueError(
                f"artifact kind is {self.kind!r}; render_frame needs a "
                "--frame export"
            )
        out = self.exported.call(
            self.params,
            np.asarray(pose, dtype=np.float32),
            np.float32(focal),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def render(self, rays_o, rays_d) -> Dict[str, np.ndarray]:
        if self.kind != "tile":
            raise ValueError(
                f"artifact kind is {self.kind!r}; render(rays) needs a "
                "tile export"
            )
        rays_o = np.asarray(rays_o, dtype=np.float32)
        rays_d = np.asarray(rays_d, dtype=np.float32)
        n = rays_o.shape[0]
        t = self.tile
        n_tiles = -(-n // t)
        pad = n_tiles * t - n
        ro = np.pad(rays_o, ((0, pad), (0, 0)))
        # pad direction z with 1 so padded rays stay non-degenerate
        rd = np.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
        outs = []
        for i in range(n_tiles):
            outs.append(
                self.exported.call(
                    self.params, ro[i * t:(i + 1) * t], rd[i * t:(i + 1) * t]
                )
            )
        return {
            k: np.concatenate([np.asarray(o[k]) for o in outs], axis=0)[:n]
            for k in outs[0]
        }


def load_serving_artifact(path) -> ServingRenderer:
    from jax import export as jexport

    path = Path(path)
    exported = jexport.deserialize((path / _EXPORT_FILE).read_bytes())
    meta = json.loads((path / _META_FILE).read_text())
    z = np.load(path / _PARAMS_FILE)
    params = tuple(z[n] for n in meta["leaf_names"])
    return ServingRenderer(exported=exported, params=params, meta=meta)


def main(argv=None):
    import argparse

    from ..utils.compile_cache import enable_compilation_cache
    from .inference import load_checkpoint

    p = argparse.ArgumentParser(
        description="Export a checkpoint's renderer as an AOT serving artifact"
    )
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint file or run dir (latest is picked)")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--tile", type=int, default=256,
                   help="rays per compiled call (default 256 — the measured "
                        "eval sweet spot, DESIGN.md)")
    p.add_argument("--frame", type=int, nargs=2, metavar=("H", "W"),
                   default=None,
                   help="export a full-frame renderer at this resolution "
                        "(call(params, pose, focal) — ray gen + tiling "
                        "inside the compiled program) instead of the tile "
                        "renderer")
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering platforms "
                        "(default: current backend + cpu)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--compile_cache", default="auto")
    args = p.parse_args(argv)

    enable_compilation_cache(args.compile_cache)
    models, cfg, _, _ = load_checkpoint(args.checkpoint)
    platforms = tuple(s for s in args.platforms.split(",") if s) or None
    out = save_serving_artifact(
        args.out, models, cfg.model, cfg.render,
        tile=args.tile, compute_dtype=args.compute_dtype, platforms=platforms,
        frame=tuple(args.frame) if args.frame else None,
    )
    meta = json.loads((out / _META_FILE).read_text())
    print(
        f"exported {out / _EXPORT_FILE} "
        f"({meta['kind']}, tile {meta['tile']}, frame {meta['frame']}, "
        f"platforms {meta['platforms']}, {meta['num_leaves']} param leaves)"
    )


if __name__ == "__main__":
    main()
