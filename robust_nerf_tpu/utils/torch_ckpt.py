"""Migration bridge: reference (torch ``.pt``) checkpoints <-> this framework.

A user switching from the reference keeps their trained runs:

- ``import_reference_checkpoint`` reads a checkpoint written by the
  reference's ``save_checkpoint`` (noisy_src/train.py:236-286) or
  ``save_checkpoint_with_poses`` (noisy_src/train_pose_opt.py:548-610) and
  produces a full TrainState/PoseOptState — MLP weights transposed into our
  param pytrees, the embedded config rebuilt, and (by default) the torch
  Adam first/second moments carried into the optax optimizer state so
  ``--resume`` continues seamlessly from the reference run.
- ``export_reference_checkpoint`` writes one of OUR ``.npz``/orbax
  checkpoints back out as a reference-format ``.pt`` that the reference's
  own ``load_checkpoint`` / inference CLI can consume (verified by loading
  it through the reference package in tests/test_torch_ckpt.py).

Weight layout: torch ``nn.Linear.weight`` is (out, in); our matmuls are
``h @ w`` with w (in, out), so every weight (and its Adam moments)
transposes in transit. Name map (reference model.py:119-143):
``pts_linears.{i}`` <-> ``trunk_{i}``, ``sigma_linear`` <-> ``sigma``,
``feature_linear`` <-> ``feat``, ``dir_linear`` <-> ``dir``,
``rgb_linear`` <-> ``rgb``.

torch is only imported inside these functions — the rest of the framework
stays torch-free and this module degrades with a clear error when torch is
absent.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import NeRFConfig, PoseOptConfig, config_from_dict, config_to_dict

# Reference dataclass fields (noisy_src/config.py:10-83). The reference's
# inference.load_checkpoint does ModelConfig(**cfg["model"]) with no
# unknown-key tolerance (inference.py:53-54), so exports must filter our
# superset configs down to exactly these.
_REF_FIELDS = {
    "model": ("pos_freqs", "dir_freqs", "hidden_dim", "num_hidden_layers",
              "skips", "use_view_dirs"),
    "render": ("near", "far", "num_samples", "num_samples_fine",
               "use_hierarchical", "perturb", "raw_noise_std",
               "white_background"),
    "data": ("scene_name", "data_root", "img_scale", "batch_size", "shuffle"),
    "train": ("lr", "lr_decay", "num_iterations", "log_every", "save_every",
              "val_every", "output_dir", "experiment_name", "device", "seed"),
}

_HEAD_MAP = (("sigma_linear", "sigma"), ("feature_linear", "feat"),
             ("dir_linear", "dir"), ("rgb_linear", "rgb"))


def _require_torch():
    try:
        import torch  # noqa: F401

        return torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "torch is required for reference-checkpoint conversion "
            "(it is only used by this module)"
        ) from e


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def ref_state_dict_to_params(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """One reference NeRF ``state_dict`` -> our flat param dict (numpy)."""
    params: Dict[str, np.ndarray] = {}
    n_layers = 0
    while f"pts_linears.{n_layers}.weight" in sd:
        n_layers += 1
    if n_layers == 0:
        raise ValueError("not a reference NeRF state_dict (no pts_linears.*)")
    for i in range(n_layers):
        params[f"trunk_{i}_w"] = _to_np(sd[f"pts_linears.{i}.weight"]).T
        params[f"trunk_{i}_b"] = _to_np(sd[f"pts_linears.{i}.bias"])
    for theirs, ours in _HEAD_MAP:
        params[f"{ours}_w"] = _to_np(sd[f"{theirs}.weight"]).T
        params[f"{ours}_b"] = _to_np(sd[f"{theirs}.bias"])
    return params


def params_to_ref_state_dict(params: Dict[str, Any], pos_freqs: int,
                             dir_freqs: int) -> Dict[str, Any]:
    """Our param dict -> a reference NeRF ``state_dict`` (torch tensors),
    including the encoder ``freq_bands`` buffers (model.py:41-48) so
    ``load_state_dict(strict=True)`` succeeds."""
    torch = _require_torch()

    def _t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())

    sd: Dict[str, Any] = {
        "pos_encoder.freq_bands": torch.from_numpy(
            (2.0 ** np.arange(pos_freqs)).astype(np.float32)
        ),
        "dir_encoder.freq_bands": torch.from_numpy(
            (2.0 ** np.arange(dir_freqs)).astype(np.float32)
        ),
    }
    i = 0
    while f"trunk_{i}_w" in params:
        sd[f"pts_linears.{i}.weight"] = _t(params[f"trunk_{i}_w"]).T.contiguous()
        sd[f"pts_linears.{i}.bias"] = _t(params[f"trunk_{i}_b"])
        i += 1
    for theirs, ours in _HEAD_MAP:
        sd[f"{theirs}.weight"] = _t(params[f"{ours}_w"]).T.contiguous()
        sd[f"{theirs}.bias"] = _t(params[f"{ours}_b"])
    return sd


def _ordered_param_names(sd: Dict[str, Any]) -> list:
    """Our param names in the reference module's ``parameters()`` order —
    the order torch Adam indexes its per-param state by. ``state_dict``
    preserves registration order; dropping the (bufferised) freq_bands
    leaves exactly the parameter sequence."""
    names = []
    for k in sd:
        if "freq_bands" in k:
            continue
        if k.startswith("pts_linears."):
            _, i, kind = k.split(".")
            names.append(f"trunk_{i}_{'w' if kind == 'weight' else 'b'}")
        else:
            head, kind = k.split(".")
            ours = dict(_HEAD_MAP)[head]
            names.append(f"{ours}_{'w' if kind == 'weight' else 'b'}")
    return names


def _adam_moments(opt_sd: Dict[str, Any], ordered_names: list,
                  offset: int) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """torch Adam state (exp_avg/exp_avg_sq by flat param index) -> our
    (mu, nu) dicts, transposing the weight moments like the weights."""
    state = opt_sd.get("state", {})
    mu: Dict[str, np.ndarray] = {}
    nu: Dict[str, np.ndarray] = {}
    for j, name in enumerate(ordered_names):
        s = state.get(offset + j) or state.get(str(offset + j))
        if s is None:
            raise KeyError(f"torch Adam state missing param index {offset + j}")
        m, v = _to_np(s["exp_avg"]), _to_np(s["exp_avg_sq"])
        if name.endswith("_w"):
            m, v = m.T, v.T
        mu[name], nu[name] = m, v
    return mu, nu


def _replace_counted_states(opt_state, count: int, mu=None, nu=None):
    """Recursively rewrite an optax state pytree: every state with a
    ``count`` field gets count=iteration (Adam bias correction + LR
    schedule resume at the right step); ScaleByAdamState additionally gets
    the imported moments when provided."""
    import jax.numpy as jnp
    import optax

    cnt = jnp.asarray(count, jnp.int32)

    def rec(s):
        if isinstance(s, optax.ScaleByAdamState):
            new_mu = s.mu if mu is None else mu
            new_nu = s.nu if nu is None else nu
            return s._replace(count=cnt, mu=new_mu, nu=new_nu)
        if hasattr(s, "_fields"):  # other NamedTuple states
            if "count" in s._fields:
                return s._replace(count=cnt)
            return s
        if isinstance(s, tuple):
            return tuple(rec(x) for x in s)
        return s

    return rec(opt_state)


def load_reference_checkpoint(path, unsafe: bool = False) -> Dict[str, Any]:
    """``torch.load`` a reference ``.pt``. Default is the safe
    (weights_only) loader; ``unsafe=True`` permits full unpickling for
    checkpoints written by torch versions that stored non-tensor objects."""
    torch = _require_torch()
    path = Path(path)
    if path.is_dir():
        path = path / "checkpoint_latest.pt"
    if not path.exists():
        raise FileNotFoundError(path)
    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not unsafe:
            raise
        return torch.load(path, map_location="cpu", weights_only=False)


def import_reference_checkpoint(
    pt_path,
    unsafe: bool = False,
    import_optimizer: bool = True,
) -> Tuple[Any, NeRFConfig, Dict[str, Any]]:
    """Reference ``.pt`` -> (state, cfg, meta).

    ``state`` is a TrainState, or a PoseOptState when the checkpoint holds
    ``camera_params`` (a pose-opt run). ``meta`` carries iteration,
    noise_config, metrics, and the extra arrays our checkpoint format
    stores for pose-opt runs. The rebuilt config pins
    ``sigma_activation="relu"`` — the reference's density activation
    (rendering.py:83) — regardless of our softplus default, so imported
    weights render identically.
    """
    from ..training.steps import (
        create_pose_opt_state,
        create_train_state,
        make_optimizer,
        make_pose_optimizer,
    )

    import jax
    import jax.numpy as jnp

    ckpt = load_reference_checkpoint(pt_path, unsafe=unsafe)
    iteration = int(ckpt.get("iteration", 0))

    cfg = config_from_dict(ckpt.get("config", {}))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, sigma_activation="relu")
    )

    models = {"coarse": ref_state_dict_to_params(ckpt["model_coarse"])}
    if "model_fine" in ckpt:
        models["fine"] = ref_state_dict_to_params(ckpt["model_fine"])
    use_hier = "fine" in models
    if cfg.render.use_hierarchical != use_hier:
        cfg = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, use_hierarchical=use_hier)
        )

    is_pose_opt = "camera_params" in ckpt
    meta: Dict[str, Any] = {
        "iteration": iteration,
        "noise_config": ckpt.get("noise_config"),
        "metrics": _plain(ckpt.get("metrics")),
        "extra_arrays": {},
    }

    ordered = _ordered_param_names(ckpt["model_coarse"])
    key = jax.random.PRNGKey(0)

    if is_pose_opt:
        if cfg.pose_opt is None:
            cfg = dataclasses.replace(cfg, pose_opt=PoseOptConfig())
        cam_sd = ckpt["camera_params"]
        initial_poses = _to_np(ckpt.get("initial_poses",
                                        cam_sd["initial_poses"]))
        state = create_pose_opt_state(key, cfg, initial_poses)
        pose_params = {
            "rotation_deltas": _to_np(cam_sd["rotation_deltas"]),
            "translation_deltas": _to_np(cam_sd["translation_deltas"]),
        }
        state = state._replace(
            models=_as_jnp(models),
            pose_params=jax.tree_util.tree_map(jnp.asarray, pose_params),
            step=jnp.asarray(iteration, jnp.int32),
        )
        if import_optimizer and "optimizer_nerf" in ckpt:
            state = state._replace(opt_state=_import_nerf_opt(
                ckpt["optimizer_nerf"], ordered, models, iteration,
                make_optimizer(cfg, per_model_clip=True),
            ))
        else:
            state = state._replace(opt_state=_replace_counted_states(
                state.opt_state, iteration))
        pose_opt_sd = ckpt.get("optimizer_poses")
        n_pose_params = (
            len(pose_opt_sd.get("state", {})) if pose_opt_sd else 0
        )
        if import_optimizer and pose_opt_sd and n_pose_params == 2:
            # both deltas learnable (the default): param order is
            # rotation, translation (registration order, :102-120)
            pmu = {"rotation_deltas": _to_np(_opt_entry(pose_opt_sd, 0)["exp_avg"]),
                   "translation_deltas": _to_np(_opt_entry(pose_opt_sd, 1)["exp_avg"])}
            pnu = {"rotation_deltas": _to_np(_opt_entry(pose_opt_sd, 0)["exp_avg_sq"]),
                   "translation_deltas": _to_np(_opt_entry(pose_opt_sd, 1)["exp_avg_sq"])}
            state = state._replace(pose_opt_state=_replace_counted_states(
                make_pose_optimizer(cfg).init(state.pose_params), iteration,
                mu=_as_jnp(pmu), nu=_as_jnp(pnu)))
        else:
            if import_optimizer and pose_opt_sd and n_pose_params == 1:
                print("note: single learnable pose delta is ambiguous in the "
                      "torch state — pose Adam moments start fresh")
            state = state._replace(pose_opt_state=_replace_counted_states(
                state.pose_opt_state, iteration))
        meta["extra_arrays"] = {
            "initial_poses": initial_poses,
            "current_poses": np.asarray(
                jax.device_get(_current_poses(state))),
        }
        if "pose_errors" in ckpt:
            meta["metrics"] = {**(meta["metrics"] or {}),
                               "pose_errors": _plain(ckpt["pose_errors"])}
    else:
        state = create_train_state(key, cfg)
        state = state._replace(
            models=_as_jnp(models), step=jnp.asarray(iteration, jnp.int32)
        )
        if import_optimizer and "optimizer" in ckpt:
            state = state._replace(opt_state=_import_nerf_opt(
                ckpt["optimizer"], ordered, models, iteration,
                make_optimizer(cfg),
            ))
        else:
            state = state._replace(opt_state=_replace_counted_states(
                state.opt_state, iteration))

    return state, cfg, meta


def _opt_entry(opt_sd, idx):
    state = opt_sd.get("state", {})
    s = state.get(idx) or state.get(str(idx))
    if s is None:
        raise KeyError(f"torch Adam state missing param index {idx}")
    return s


def _import_nerf_opt(opt_sd, ordered, models, iteration, opt):
    """Rebuild the optax opt_state for the NeRF models with torch Adam
    moments. torch indexes coarse params first, then fine
    (train.py:398-402). Falls back to fresh moments when the torch
    optimizer never stepped (empty per-param state)."""
    if not opt_sd.get("state"):
        print("note: torch optimizer has no per-param state (never "
              "stepped) — Adam moments start fresh")
        return _replace_counted_states(opt.init(_as_jnp(models)), iteration)
    mu_c, nu_c = _adam_moments(opt_sd, ordered, offset=0)
    mu = {"coarse": mu_c}
    nu = {"coarse": nu_c}
    if "fine" in models:
        mu["fine"], nu["fine"] = _adam_moments(opt_sd, ordered,
                                               offset=len(ordered))
    return _replace_counted_states(
        opt.init(_as_jnp(models)), iteration, mu=_as_jnp(mu), nu=_as_jnp(nu)
    )


def _as_jnp(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, tree)


def _current_poses(state):
    from ..training.steps import current_poses

    return current_poses(state)


def _plain(obj):
    """Best-effort conversion of checkpoint metadata to JSON-serializable
    plain types (torch scalars/tensors -> python/list)."""
    if obj is None:
        return None
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if hasattr(obj, "item") and getattr(obj, "ndim", 1) == 0:
        return obj.item()
    if hasattr(obj, "tolist"):
        return obj.tolist()
    if isinstance(obj, (str, int, float, bool)):
        return obj
    return str(obj)


def save_imported_checkpoint(out_dir, state, cfg: NeRFConfig,
                             meta: Dict[str, Any], is_best: bool = False,
                             backend: str = "npz") -> Path:
    """Write the imported state as one of OUR checkpoints (npz/orbax) so
    --resume and the inference CLI pick it up directly."""
    from ..training.checkpoints import save_checkpoint

    return save_checkpoint(
        Path(out_dir), meta["iteration"], state, config_to_dict(cfg),
        noise_config_dict=meta.get("noise_config"),
        metrics=meta.get("metrics"),
        is_best=is_best,
        extra_arrays=meta.get("extra_arrays") or None,
        backend=backend,
    )


def export_reference_checkpoint(ckpt_path, out_path) -> Path:
    """One of OUR checkpoints -> a reference-format ``.pt`` the reference's
    ``load_checkpoint`` (train.py:289-304, inference.py:33-72) loads
    as-is. Pose-opt checkpoints additionally carry ``camera_params`` +
    ``initial_poses`` (train_pose_opt.py:563-597). Optimizer state is not
    exported (the reference never resumes through its CLI)."""
    torch = _require_torch()

    import jax

    from ..training.checkpoints import (
        find_checkpoint,
        load_checkpoint_raw,
        restore_into,
    )
    from ..training.steps import create_pose_opt_state, create_train_state

    leaves, meta, extra = load_checkpoint_raw(find_checkpoint(Path(ckpt_path)))
    cfg = config_from_dict(meta["config"])
    key = jax.random.PRNGKey(0)
    if "initial_poses" in extra:
        template = create_pose_opt_state(
            key, cfg, np.asarray(extra["initial_poses"]))
    else:
        template = create_train_state(key, cfg)
    state = restore_into(template, leaves)

    if cfg.model.sigma_activation != "relu":
        print(
            "warning: this run trained with sigma_activation="
            f"{cfg.model.sigma_activation!r}; the reference always applies "
            "ReLU to density (rendering.py:83), so densities will differ "
            "under the reference renderer"
        )

    cfg_dict = config_to_dict(cfg)
    ref_cfg = {
        sect: {k: v for k, v in cfg_dict.get(sect, {}).items()
               if k in fields}
        for sect, fields in _REF_FIELDS.items()
    }
    ref_cfg["model"]["skips"] = tuple(ref_cfg["model"].get("skips", (4,)))

    out = {
        "iteration": int(meta.get("iteration", 0)),
        "model_coarse": params_to_ref_state_dict(
            state.models["coarse"], cfg.model.pos_freqs, cfg.model.dir_freqs),
        "config": ref_cfg,
    }
    if "fine" in state.models:
        out["model_fine"] = params_to_ref_state_dict(
            state.models["fine"], cfg.model.pos_freqs, cfg.model.dir_freqs)
    if meta.get("noise_config"):
        out["noise_config"] = meta["noise_config"]
    if meta.get("metrics"):
        out["metrics"] = meta["metrics"]
    if "initial_poses" in extra:
        init = torch.from_numpy(
            np.asarray(extra["initial_poses"], dtype=np.float32))
        out["camera_params"] = {
            "initial_poses": init,
            "rotation_deltas": torch.from_numpy(np.asarray(
                state.pose_params["rotation_deltas"], dtype=np.float32)),
            "translation_deltas": torch.from_numpy(np.asarray(
                state.pose_params["translation_deltas"], dtype=np.float32)),
        }
        out["initial_poses"] = init

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    torch.save(out, out_path)
    return out_path
