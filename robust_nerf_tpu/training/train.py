"""Standard (fixed-pose) training entry point.

Behavioral parity with `python -m noisy_src.train` (reference:
noisy_src/train.py:307-698): same CLI flags, experiment naming
({scene}_{noisedesc}_{ts}), output layout, CSV cadence (one row per
iteration), val/save schedule, checkpoint naming and summary.json keys —
but executed as scanned jit chunks on a TPU mesh.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from datetime import datetime
from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..config import (
    DataConfig,
    ModelConfig,
    NeRFConfig,
    RenderConfig,
    TPUConfig,
    TrainConfig,
    config_to_dict,
)
from ..core.noise import NoiseConfig
from ..data.banks import build_ray_bank, shard_bank
from ..data.synthetic import load_scene
from ..evalx.metrics import LPIPSMetric
from ..models.nerf import count_params
from ..parallel.mesh import create_mesh, is_primary_host, replicate, sync_string
from ..parallel.tp import maybe_shard_state, mesh_for
from ..utils.compile_cache import enable_compilation_cache
from ..utils.logger import ExperimentLogger, TrainingMetrics
from ..utils.train_utils import EarlyStopping
from .checkpoints import (
    ckpt_needs_all_processes,
    finalize_checkpoints,
    find_checkpoint,
    load_checkpoint_raw,
    restore_into,
    save_checkpoint,
)
from .evaluation import evaluate
from .steps import create_train_state, hashgrid_scan_cap, make_train_chunk
from .watchdog import EX_TEMPFAIL, WedgeTimeout, run_with_watchdog


def generate_experiment_name(
    scene: str, noise_config: Optional[NoiseConfig], base_name: str = ""
) -> str:
    """{scene}_{noisedesc}_{YYYYmmdd_HHMMSS} (reference: train.py:45-65)."""
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    noise_desc = (
        str(noise_config)
        if noise_config is not None and noise_config.has_noise
        else "clean"
    )
    if base_name:
        return f"{scene}_{base_name}_{noise_desc}_{timestamp}"
    return f"{scene}_{noise_desc}_{timestamp}"


def _chunk_schedule(i: int, total: int, cfg: NeRFConfig) -> int:
    """Steps to run in the next scan so we stop exactly on log/val/save
    boundaries (all compile-cached per distinct size)."""
    t = cfg.train
    nxt = min(
        t.log_every - i % t.log_every,
        t.val_every - i % t.val_every,
        t.save_every - i % t.save_every,
        total - i,
    )
    return max(1, min(nxt, hashgrid_scan_cap(cfg)))


def train(
    config: NeRFConfig,
    noise_config: Optional[NoiseConfig] = None,
    val_noise_config: Optional[NoiseConfig] = None,
) -> Dict:
    """Run standard NeRF training. Returns the run summary dict.

    Reference semantics: noisy_src/train.py:307-577 — train poses optionally
    noised at ray-bank build; validation always clean.
    """
    cfg = config
    mesh = mesh_for(cfg.tpu)

    if cfg.train.experiment_name in ("auto", "baseline", ""):
        exp_name = generate_experiment_name(cfg.data.scene_name, noise_config)
    else:
        exp_name = cfg.train.experiment_name
    exp_name = sync_string(exp_name)   # multihost: timestamps can diverge
    output_dir = Path(cfg.train.output_dir) / exp_name

    logger = (ExperimentLogger(output_dir, resume=cfg.train.resume is not None)
              if is_primary_host() else None)
    config_dict = config_to_dict(cfg)
    _save_ckpt = partial(save_checkpoint, backend=cfg.train.ckpt_backend)
    # orbax backends run multihost barriers inside save: every process must
    # make the save call (logging/printing stays primary-only)
    save_on_all = ckpt_needs_all_processes(cfg.train.ckpt_backend)
    if logger is not None:
        logger.log_config(config_dict)
        with open(output_dir / "experiment_config.json", "w") as f:
            json.dump(
                {
                    "experiment_name": exp_name,
                    "config": config_dict,
                    "noise_config": config_to_dict(noise_config) if noise_config else None,
                    "num_devices": int(np.prod(mesh.devices.shape)),
                },
                f,
                indent=2,
            )

    # --- Data ---------------------------------------------------------
    train_scene = load_scene(cfg.data, "train")
    val_scene = load_scene(cfg.data, "val")
    bank, used_poses, noise_infos = build_ray_bank(train_scene, noise_config)
    if cfg.tpu.shard_bank and int(np.prod(mesh.devices.shape)) > 1:
        bank = shard_bank(bank, mesh)   # 1/D bank HBM per chip
    else:
        bank = replicate(bank, mesh)
    if noise_infos and logger is not None:
        rots = [i.get("actual_rotation_deg", 0.0) for i in noise_infos]
        trans = [i.get("actual_translation_norm", 0.0) for i in noise_infos]
        print(
            f"Applied pose noise: rot mean {np.mean(rots):.3f} deg, "
            f"trans mean {np.mean(trans):.4f}"
        )

    # --- State / resume ------------------------------------------------
    key = jax.random.PRNGKey(cfg.train.seed)
    state = create_train_state(key, cfg)
    start_iter = 0
    if cfg.train.resume is not None:
        leaves, meta, _ = load_checkpoint_raw(find_checkpoint(cfg.train.resume))
        state = restore_into(state, leaves)
        start_iter = int(meta["iteration"])
        print(f"Resumed from iteration {start_iter}")
    state = maybe_shard_state(state, mesh, cfg)

    if logger is not None:
        n_params = count_params(state.models["coarse"])
        logger.log_model_info("model_coarse", n_params, n_params)
        if "fine" in state.models:
            n_fine = count_params(state.models["fine"])
            logger.log_model_info("model_fine", n_fine, n_fine)

    lpips_metric = LPIPSMetric()
    chunk_fns = {}
    base_key = jax.random.PRNGKey(cfg.train.seed + 1)
    total = cfg.train.num_iterations
    best_psnr = float("-inf")
    # opt-in early stop on val PSNR (the reference defined EarlyStopping
    # but never used it, noisy_src/utils.py:218-252). Val metrics are
    # computed identically on every process, so the stop decision is
    # multihost-consistent.
    stopper = (EarlyStopping(patience=cfg.train.early_stop_patience,
                             mode="max")
               if cfg.train.early_stop_patience > 0 else None)
    i = start_iter
    profile_dir = getattr(cfg.train, "profile_dir", None)
    profiling = False

    while i < total:
        if profile_dir and not profiling and i >= start_iter + cfg.tpu.steps_per_scan:
            # capture one steady-state chunk (jax.profiler trace ->
            # tensorboard-compatible; SURVEY.md 5.1 TPU-native tracing)
            jax.profiler.start_trace(str(profile_dir))
            profiling = True
        n = _chunk_schedule(i, total, cfg)
        if n not in chunk_fns:
            chunk_fns[n] = make_train_chunk(cfg, mesh, steps=n)
        t0 = time.time()
        state, metrics = chunk_fns[n](state, bank, base_key)
        try:
            metrics = run_with_watchdog(
                lambda: jax.device_get(metrics),
                cfg.train.wedge_timeout_s,
                what=f"train chunk @ iter {i}",
            )
        except WedgeTimeout as e:
            print(f"WATCHDOG: {e}", flush=True)
            if logger is not None:
                logger.close()
            sys.exit(EX_TEMPFAIL)
        dt = time.time() - t0
        time_per_iter = dt / n
        rays_per_sec = cfg.data.batch_size / time_per_iter

        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            profile_dir = None
            print(f"profiler trace written (one {n}-step chunk)")

        if logger is not None:
            for j in range(n):
                logger.log_training(
                    TrainingMetrics(
                        iteration=i + j,
                        loss=float(metrics["loss"][j]),
                        loss_coarse=float(metrics["loss_coarse"][j]),
                        loss_fine=float(metrics["loss_fine"][j]),
                        psnr=float(metrics["psnr"][j]),
                        learning_rate=float(metrics["learning_rate"][j]),
                        time_per_iter=time_per_iter,
                        rays_per_sec=rays_per_sec,
                    )
                )
        i += n

        if i % cfg.train.log_every == 0 or i >= total:
            print(
                f"iter {i:7d}/{total} loss {metrics['loss'][-1]:.5f} "
                f"psnr {metrics['psnr'][-1]:.2f} {rays_per_sec:,.0f} rays/s"
            )

        if i % cfg.train.val_every == 0 and i < total:
            # EVERY process enters the jitted render: the val computation
            # spans the global mesh, so on multihost runs all processes
            # must participate. Logging/saving stays primary-only.
            val = evaluate(state.models, val_scene, logger, i, cfg,
                           lpips_metric=lpips_metric, mesh=mesh)
            # best tracking on EVERY process: val is computed identically
            # everywhere, and multihost orbax saves need all processes to
            # agree on is_best (it selects the pointer update)
            is_best = val.psnr > best_psnr
            best_psnr = max(best_psnr, val.psnr)
            if logger is not None:
                logger.log_validation(val)
                print(f"  val @ {i}: PSNR {val.psnr:.2f} SSIM {val.ssim:.4f}")
            if logger is not None or save_on_all:
                _save_ckpt(
                    output_dir, i, state, config_dict,
                    config_to_dict(noise_config) if noise_config else None,
                    metrics={"val_psnr": val.psnr, "val_ssim": val.ssim},
                    is_best=is_best,
                )
            if stopper is not None and stopper.step(val.psnr):
                print(
                    f"EARLY STOP @ iter {i}: val PSNR has not improved for "
                    f"{stopper.patience} validations (best {stopper.best:.2f})"
                )
                total = i   # final eval/checkpoint labeled with the real iter
                break
        elif (i % cfg.train.save_every == 0 and i < total
              and (logger is not None or save_on_all)):
            _save_ckpt(
                output_dir, i, state, config_dict,
                config_to_dict(noise_config) if noise_config else None,
            )

    # --- Final evaluation over the full val split -----------------------
    summary: Dict = {}
    # all processes render (multihost: the jit spans the global mesh)
    val = evaluate(
        state.models, val_scene, logger, total, cfg,
        num_images=val_scene.images.shape[0], lpips_metric=lpips_metric,
        mesh=mesh,
    )
    is_best = val.psnr > best_psnr
    if logger is not None or save_on_all:
        _save_ckpt(
            output_dir, total, state, config_dict,
            config_to_dict(noise_config) if noise_config else None,
            metrics={"val_psnr": val.psnr, "val_ssim": val.ssim},
            is_best=is_best,
        )
    if logger is not None:
        logger.log_validation(val)
        logger.save_summary()
        logger.close()
        with open(output_dir / "summary.json") as f:
            summary = json.load(f)
        print(f"Done. final val PSNR {val.psnr:.2f}, output: {output_dir}")
    finalize_checkpoints()   # flush any in-flight orbax_async write
    return summary


def build_config_from_args(args) -> NeRFConfig:
    return NeRFConfig(
        model=ModelConfig(
            sigma_activation=args.sigma_activation,
            architecture=args.architecture,
            hash_impl=args.hash_impl,
            hash_levels=args.hash_levels,
            hash_features=args.hash_features,
            hash_log2_size=args.hash_log2_size,
            hash_base_res=args.hash_base_res,
            hash_max_res=args.hash_max_res,
            hash_hidden_dim=args.hash_hidden_dim,
            hash_layers=args.hash_layers,
            hash_color_layers=args.hash_color_layers,
            scene_bound=args.scene_bound,
        ),
        render=RenderConfig(
            num_samples=args.num_samples,
            num_samples_fine=args.num_samples_fine,
            use_hierarchical=not args.no_hierarchical,
        ),
        data=DataConfig(
            scene_name=args.scene,
            data_root=args.data_root,
            img_scale=args.img_scale,
            batch_size=args.batch_size,
            source=args.data_source,
            synthetic_resolution=args.synthetic_resolution,
            synthetic_textured=args.synthetic_textured,
        ),
        train=TrainConfig(
            lr=args.lr,
            num_iterations=args.num_iters,
            log_every=args.log_every,
            val_every=args.val_every,
            save_every=args.save_every,
            output_dir=args.output_dir,
            experiment_name=args.exp_name,
            device=args.device,
            seed=args.seed,
            resume=args.resume,
            wedge_timeout_s=args.wedge_timeout,
            ckpt_backend=args.ckpt_backend,
            early_stop_patience=getattr(args, "early_stop_patience", 0),
        ),
        tpu=TPUConfig(
            compute_dtype=args.compute_dtype,
            steps_per_scan=args.steps_per_scan,
            num_devices=args.num_devices,
            use_pallas=args.use_pallas,
            shard_bank=args.shard_bank,
            microbatch=args.microbatch,
            tensor_parallel=args.tensor_parallel,
        ),
    )


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--scene", type=str, default="lego")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--img_scale", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--no_hierarchical", action="store_true")
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--num_samples_fine", type=int, default=128)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--save_every", type=int, default=10000)
    parser.add_argument("--output_dir", type=str, default="outputs")
    parser.add_argument("--device", type=str, default="tpu",
                        help="accepted for reference-CLI parity; JAX selects the backend")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint file or experiment dir to resume from")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of one steady-state chunk")
    # noise group (reference: train.py:629-637)
    parser.add_argument("--rotation_noise", type=float, default=0.0)
    parser.add_argument("--translation_noise", type=float, default=0.0)
    parser.add_argument("--translation_noise_pct", type=float, default=0.0)
    parser.add_argument("--noise_seed", type=int, default=None)
    # TPU extras
    parser.add_argument("--data_source", type=str, default="blender",
                        choices=["blender", "synthetic"])
    parser.add_argument("--synthetic_resolution", type=int, default=64,
                        help="procedural-scene image resolution")
    parser.add_argument("--synthetic_textured", action="store_true",
                        help="texture the procedural scene's albedo")
    parser.add_argument("--architecture", type=str, default="mlp",
                        choices=["mlp", "hashgrid"],
                        help="model family: 'mlp' = reference-parity "
                        "frequency MLP; 'hashgrid' = TPU-native "
                        "multiresolution hash grid (models/hashgrid.py — "
                        "same PSNR in far fewer seconds; try --lr 1e-2)")
    parser.add_argument("--hash_impl", type=str, default="packed",
                        choices=["packed", "xor"],
                        help="table indexing scheme: 'packed' = TPU-native "
                        "lattice hash (one wide gather/scatter row per "
                        "point per level; default), 'xor' = classic NGP "
                        "XOR hash (pre-round-5 checkpoints)")
    parser.add_argument("--hash_levels", type=int, default=12)
    parser.add_argument("--hash_features", type=int, default=2)
    parser.add_argument("--hash_log2_size", type=int, default=17)
    parser.add_argument("--hash_base_res", type=int, default=16)
    parser.add_argument("--hash_max_res", type=int, default=512)
    parser.add_argument("--hash_hidden_dim", type=int, default=64)
    parser.add_argument("--hash_layers", type=int, default=1)
    parser.add_argument("--hash_color_layers", type=int, default=2)
    parser.add_argument("--scene_bound", type=float, default=1.5,
                        help="AABB half-extent normalizing hash-grid inputs")
    parser.add_argument("--sigma_activation", type=str, default="softplus",
                        choices=("softplus", "relu"),
                        help="density activation: softplus (default, "
                             "smoother pose gradients) or relu (strict "
                             "reference numerics; use when resuming a "
                             "checkpoint imported from the reference)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--steps_per_scan", type=int, default=100)
    parser.add_argument("--microbatch", type=int, default=-1,
                        help="accumulate gradients over microbatches of this "
                             "many rays (one optimizer update per full "
                             "--batch_size; same optimizer semantics). 256 is the "
                             "measured v5e per-ray sweet spot — large "
                             "batches run fastest and O(microbatch) "
                             "activation memory makes million-ray batches "
                             "fit HBM. -1 = auto (256 on TPU, off on CPU), "
                             "0 = off")
    parser.add_argument("--num_devices", type=int, default=0)
    parser.add_argument("--shard_bank", action="store_true",
                        help="split the ray/pixel bank across devices "
                             "(1/D bank HBM per chip) instead of replicating")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="shard the MLP hidden dim this many ways over "
                             "a second (model) mesh axis; the mesh becomes "
                             "(devices/tp, tp). 1 = pure data parallel "
                             "(default; the reference-size MLP fits one "
                             "chip — use for much wider models)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for pod/"
                             "multi-process runs (coordinator from env)")
    parser.add_argument("--use_pallas", nargs="?", const="on", default="auto",
                        choices=["auto", "on", "off"],
                        help="fused Pallas MLP kernels; default auto = "
                             "measured-fastest path per context, currently "
                             "plain XLA for both train and eval "
                             "(bare flag forces the kernels on)")
    parser.add_argument("--wedge_timeout", type=float, default=0.0,
                        help="seconds without dispatch progress before the "
                             "watchdog exits EX_TEMPFAIL(75) for a "
                             "supervised --resume relaunch (0 = off)")
    parser.add_argument("--ckpt_backend", type=str, default="npz",
                        choices=["npz", "orbax", "orbax_async"],
                        help="checkpoint format: single-file npz, orbax "
                             "directories (multi-host coordinated), or "
                             "orbax_async (disk write overlaps training)")
    parser.add_argument("--early_stop_patience", type=int, default=0,
                        help="stop when val PSNR hasn't improved for this "
                             "many validations (0 = off)")
    parser.add_argument("--compile_cache", type=str, default="auto",
                        help="persistent XLA compilation cache directory "
                             "('auto' = $ROBUST_NERF_COMPILE_CACHE or "
                             "~/.cache/robust_nerf_tpu/xla, 'off' = disable); "
                             "reruns of an identical config skip the "
                             "multi-second train-step compile")


def maybe_init_multihost(args):
    """Pod-scale entry: one jax process per host, coordinator from the
    standard JAX env vars. Logging/checkpointing stays on process 0
    (parallel/mesh.is_primary_host)."""
    if getattr(args, "multihost", False):
        jax.distributed.initialize()
        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.device_count()} global devices"
        )


def main(argv=None):
    parser = argparse.ArgumentParser(
        allow_abbrev=False,
        description="Train NeRF (TPU-native), optionally with noisy camera poses"
    )
    add_common_args(parser)
    parser.add_argument("--num_iters", type=int, default=200000)
    parser.add_argument("--val_every", type=int, default=5000)
    parser.add_argument("--exp_name", type=str, default="auto")
    args = parser.parse_args(argv)
    enable_compilation_cache(args.compile_cache)
    maybe_init_multihost(args)

    config = build_config_from_args(args)
    if args.profile:
        config.train.profile_dir = (
            Path(args.output_dir) / "profile"
        )
    noise_config = NoiseConfig(
        rotation_noise_deg=args.rotation_noise,
        translation_noise=args.translation_noise,
        translation_noise_pct=args.translation_noise_pct,
        seed=args.noise_seed,
    )
    if not noise_config.has_noise:
        noise_config = None
    train(config, noise_config)


if __name__ == "__main__":
    main()
