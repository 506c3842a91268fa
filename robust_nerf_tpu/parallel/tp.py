"""Tensor (model) parallelism: hidden-dim sharding of the NeRF MLPs.

The reference is single-GPU and has no model-parallel story at all
(SURVEY.md §5.8); data parallelism over rays (parallel/mesh.py) already
covers its scale. This module adds the second, composable scaling axis
the TPU mesh makes natural: a 2-D `(data, model)` mesh where the ray
batch shards along `data` and the MLP hidden dimension shards along
`model`, Megatron-style — alternating column-parallel (weight split on
the output dim, activations become feature-sharded) and row-parallel
(weight split on the input dim, XLA inserts the psum) trunk layers, so
cross-chip traffic is one all-reduce per layer pair instead of per
layer. The implementation is pure GSPMD: parameters are *placed* with
`NamedSharding`s and jit propagates — no hand-written collectives, per
the standard JAX sharding recipe (annotate, compile, let XLA insert
collectives over ICI).

When a dimension does not divide the model-axis size the layer falls
back to replicated weights (still correct, just not sharded); the skip
layer (whose output is concatenated with the replicated encoding) and
the small heads are kept replicated by construction so no mixed-sharding
concats arise.

Use: `mesh = create_mesh_2d(data, model)`, then
`state = shard_train_state(state, mesh)` (or `shard_pose_opt_state`)
in place of `parallel.mesh.replicate`, and run the ordinary
`make_train_chunk(cfg, mesh=mesh)` — the chunk's data-axis batch
constraint composes unchanged; grads and Adam moments inherit the
parameter shardings through propagation.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from .mesh import DATA_AXIS

MODEL_AXIS = "model"


def mesh_for(tpu_cfg) -> Mesh:
    """Build the device mesh a TPUConfig asks for: 1-D data mesh when
    tensor_parallel <= 1, else a (data, model) 2-D mesh."""
    from .mesh import create_mesh

    tp = int(getattr(tpu_cfg, "tensor_parallel", 1) or 1)
    if tp <= 1:
        return create_mesh(tpu_cfg.num_devices)
    n = tpu_cfg.num_devices or len(jax.devices())
    if n % tp != 0:
        raise ValueError(
            f"tensor_parallel={tp} must divide the device count ({n})"
        )
    return create_mesh_2d(n // tp, tp)


def maybe_shard_state(state, mesh: Mesh, cfg):
    """Place a Train/PoseOpt state for `mesh`: tensor-sharded params +
    moments on a 2-D mesh, plain replication otherwise."""
    from ..training.steps import PoseOptState
    from .mesh import replicate

    if model_axis_size(mesh) <= 1:
        return replicate(state, mesh)
    if getattr(cfg.model, "architecture", "mlp") != "mlp":
        raise ValueError(
            "tensor_parallel > 1 implements the frequency-MLP family only; "
            f"architecture={cfg.model.architecture!r} params (hash tables + "
            "a tiny MLP) fit one chip by design — use data parallelism"
        )
    if isinstance(state, PoseOptState):
        return shard_pose_opt_state(state, mesh, cfg)
    return shard_train_state(state, mesh, cfg)


def create_mesh_2d(data: int, model: int, devices=None) -> Mesh:
    """(data, model) mesh over the first data*model visible devices."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices for a {data}x{model} mesh, "
                         f"have {len(devices)}")
    return Mesh(
        np.array(devices[:n]).reshape(data, model), (DATA_AXIS, MODEL_AXIS)
    )


def model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1


def nerf_param_specs(cfg: ModelConfig, model_size: int) -> Dict[str, P]:
    """PartitionSpec per flat param key of ONE MLP (models/nerf.py layout).

    Megatron alternation over the trunk: a layer whose input is
    replicated is column-parallel (w: P(None, 'model'), b: P('model'),
    output feature-sharded); a layer whose input is feature-sharded is
    row-parallel (w: P('model', None), b: P(), output replicated via the
    psum XLA inserts). Skip layers (cfg.skips) must end replicated —
    their output is concatenated with the replicated positional
    encoding — so a skip layer with a replicated input stays replicated.
    Heads: sigma/feat are row-parallel when the trunk output is sharded;
    the view head is column-parallel into a row-parallel RGB layer.
    Dims that don't divide `model_size` fall back to replicated.
    """
    H = cfg.hidden_dim
    div = lambda d: model_size > 1 and d % model_size == 0  # noqa: E731

    specs: Dict[str, P] = {}
    in_sharded = False
    for i in range(cfg.num_hidden_layers):
        is_skip = i in cfg.skips
        if in_sharded:
            # row-parallel: contract the sharded feature dim, psum
            specs[f"trunk_{i}_w"] = P(MODEL_AXIS, None)
            specs[f"trunk_{i}_b"] = P()
            out_sharded = False
        elif not is_skip and div(H):
            # column-parallel: shard the output features
            specs[f"trunk_{i}_w"] = P(None, MODEL_AXIS)
            specs[f"trunk_{i}_b"] = P(MODEL_AXIS)
            out_sharded = True
        else:
            specs[f"trunk_{i}_w"] = P()
            specs[f"trunk_{i}_b"] = P()
            out_sharded = False
        # concat([x_enc, h]) after a skip layer: h is replicated here by
        # construction (a sharded-input skip layer is row-parallel), so
        # the concat stays fully replicated.
        in_sharded = out_sharded

    trunk_sharded = in_sharded
    for head in ("sigma", "feat"):
        if trunk_sharded:
            specs[f"{head}_w"] = P(MODEL_AXIS, None)
            specs[f"{head}_b"] = P()
        else:
            specs[f"{head}_w"] = P()
            specs[f"{head}_b"] = P()
    # view head input = concat(feats, d_enc): replicated either way
    # (feats are row-parallel/replicated outputs).
    if div(H // 2):
        specs["dir_w"] = P(None, MODEL_AXIS)
        specs["dir_b"] = P(MODEL_AXIS)
        specs["rgb_w"] = P(MODEL_AXIS, None)
        specs["rgb_b"] = P()
    else:
        specs["dir_w"] = P()
        specs["dir_b"] = P()
        specs["rgb_w"] = P()
        specs["rgb_b"] = P()
    return specs


def _spec_suffix_table(models: Dict[str, Any], cfg: ModelConfig,
                       model_size: int):
    """{(model_name, param_key): spec} for every leaf in the models tree."""
    per_mlp = nerf_param_specs(cfg, model_size)
    return {
        (name, key): per_mlp[key]
        for name, params in models.items()
        for key in params
    }


def shard_models(models: Dict[str, Any], mesh: Mesh, cfg: ModelConfig):
    """Place {"coarse": params[, "fine": params]} with tensor shardings."""
    table = _spec_suffix_table(models, cfg, model_axis_size(mesh))
    return {
        name: {
            key: jax.device_put(v, NamedSharding(mesh, table[(name, key)]))
            for key, v in params.items()
        }
        for name, params in models.items()
    }


def _dict_key_suffix(path, n: int):
    keys = [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]
    return tuple(keys[-n:]) if len(keys) >= n else None


def shard_like_models(tree, models: Dict[str, Any], mesh: Mesh,
                      cfg: ModelConfig):
    """Place an arbitrary pytree (e.g. optax state) so that every leaf
    whose dict-path suffix and shape match a model parameter gets that
    parameter's sharding, and everything else (step counts, pose params,
    ...) is replicated. Adam's mu/nu mirror the params tree under
    `.mu`/`.nu` attributes, so suffix matching lands exactly on them."""
    table = _spec_suffix_table(models, cfg, model_axis_size(mesh))
    shapes = {
        k: models[k[0]][k[1]].shape for k in table
    }
    repl = NamedSharding(mesh, P())

    def place(path, leaf):
        suffix = _dict_key_suffix(path, 2)
        if suffix in table and getattr(leaf, "shape", None) == shapes[suffix]:
            return jax.device_put(leaf, NamedSharding(mesh, table[suffix]))
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_train_state(state, mesh: Mesh, cfg) -> Any:
    """TrainState with tensor-sharded params + matching optimizer moments.

    cfg is the full NeRFConfig (uses cfg.model for the layer layout)."""
    return state._replace(
        models=shard_models(state.models, mesh, cfg.model),
        opt_state=shard_like_models(state.opt_state, state.models, mesh,
                                    cfg.model),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
    )


def shard_pose_opt_state(state, mesh: Mesh, cfg) -> Any:
    """PoseOptState: MLPs tensor-sharded; pose params/poses replicated
    (they are per-image (N,3)/(N,4,4) — tiny, and every shard needs every
    pose for its rays)."""
    repl = NamedSharding(mesh, P())
    return state._replace(
        models=shard_models(state.models, mesh, cfg.model),
        opt_state=shard_like_models(state.opt_state, state.models, mesh,
                                    cfg.model),
        pose_params=jax.device_put(state.pose_params, repl),
        initial_poses=jax.device_put(state.initial_poses, repl),
        pose_opt_state=jax.device_put(state.pose_opt_state, repl),
        step=jax.device_put(state.step, repl),
    )
