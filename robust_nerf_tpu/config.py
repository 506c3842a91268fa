"""Configuration system for the TPU-native Robust-NeRF framework.

Behavioral parity with the reference dataclasses (reference:
noisy_src/config.py:10-125) plus TPU-specific knobs (compute dtype,
mesh/sharding, tile sizes, scan-batched stepping).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """NeRF MLP architecture (reference: noisy_src/config.py:10-24)."""

    pos_freqs: int = 10        # L for position encoding
    dir_freqs: int = 4         # L for direction encoding
    hidden_dim: int = 256
    num_hidden_layers: int = 8
    skips: Tuple[int, ...] = (4,)   # trunk layers followed by a skip-concat
    use_view_dirs: bool = True
    # Density activation. The reference uses ReLU (noisy_src/model.py:181),
    # which can die irreversibly when white-background gradient pressure
    # drives every pre-activation negative early in training (observed on
    # 2/4 init seeds). softplus is gradient-alive everywhere, converges at
    # least as fast, and is the default; "relu" gives strict parity.
    sigma_activation: str = "softplus"
    # Model family. "mlp" is the reference-parity frequency-encoded MLP
    # (all fields above); "hashgrid" is the TPU-native multiresolution
    # hash-grid family (models/hashgrid.py, Instant-NGP-style): L feature
    # tables + a tiny MLP, reaching the same PSNR in far fewer seconds.
    # No reference counterpart; hash_* fields below apply only to it.
    architecture: str = "mlp"
    hash_levels: int = 12          # multiresolution levels L
    hash_features: int = 2         # features per level F
    hash_log2_size: int = 17       # per-level table cap = 2^this entries
    hash_base_res: int = 16        # coarsest grid resolution
    hash_max_res: int = 512        # finest grid resolution
    hash_hidden_dim: int = 64      # tiny-MLP width
    hash_layers: int = 1           # hidden layers before the sigma head
    hash_color_layers: int = 2     # hidden layers in the color branch
    # Table indexing scheme. "packed" (default) is the TPU-native design:
    # the hash is LINEAR in all three voxel coords (idx = x + ky*y + kz*z
    # mod T, with (ky,kz) lattice-optimized per level), so the 8 corners of
    # any voxel sit at 8 static offsets and one corner-packed dup table
    # (built with 8 static rolls) serves the whole trilinear stencil:
    # 1 gather row/point/level forward, 1 scatter row/point/level backward
    # (vs 8 each for "xor") — measured 8x faster fwd+bwd on v5e, where
    # gather/scatter cost is per-ROW (models/hashgrid.py). "xor" is the
    # classic NGP XOR-prime hash (kept for pre-round-5 checkpoints; table
    # shapes are identical, but hashed-level indexing — and therefore
    # trained table contents — are not interchangeable).
    hash_impl: str = "packed"
    scene_bound: float = 1.5       # AABB half-extent normalizing positions


@dataclass(frozen=True)
class RenderConfig:
    """Volume rendering (reference: noisy_src/config.py:27-43)."""

    near: float = 2.0
    far: float = 6.0
    num_samples: int = 64          # coarse samples/ray
    num_samples_fine: int = 128    # extra fine samples/ray (hierarchical)
    use_hierarchical: bool = True
    perturb: bool = True           # stratified jitter during training
    raw_noise_std: float = 0.0     # density noise during training
    white_background: bool = True


@dataclass
class DataConfig:
    """Data loading (reference: noisy_src/config.py:46-56)."""

    scene_name: str = "lego"
    data_root: Optional[Path] = None
    img_scale: float = 0.5
    batch_size: int = 1024         # rays per optimizer step
    shuffle: bool = True
    # TPU extras: "blender" reads transforms_*.json from disk; "synthetic"
    # procedurally generates an analytic scene (no dataset required).
    source: str = "blender"
    synthetic_num_train: int = 20
    synthetic_num_val: int = 5
    synthetic_resolution: int = 64
    synthetic_textured: bool = False


@dataclass
class TrainConfig:
    """Training schedule (reference: noisy_src/config.py:59-83)."""

    lr: float = 5e-4
    lr_decay: int = 250            # exponential decay over lr_decay*1000 iters
    num_iterations: int = 200_000
    log_every: int = 100
    save_every: int = 10_000
    val_every: int = 5_000
    output_dir: Path = field(default_factory=lambda: Path("outputs"))
    experiment_name: str = "baseline"
    device: str = "tpu"            # accepted for CLI parity; JAX picks backend
    seed: int = 42
    grad_clip: float = 1.0
    resume: Optional[Path] = None  # wired, unlike the reference (train.py:289-304)
    # Wedge watchdog: if a device dispatch/fetch makes no progress for this
    # many seconds, exit EX_TEMPFAIL (75) so a supervisor can relaunch with
    # --resume (round-1 tunnel-wedge incident; see training/watchdog.py).
    # 0 disables.
    wedge_timeout_s: float = 0.0
    # "npz" (single-file, reference-style) or "orbax" (directory-based,
    # sharded-array aware, multi-host coordinated).
    ckpt_backend: str = "npz"
    # Stop when val PSNR hasn't improved for this many validations
    # (utils/train_utils.EarlyStopping; 0 = off). The reference defined
    # the class but never wired it (noisy_src/utils.py:218-252).
    early_stop_patience: int = 0


@dataclass
class PoseOptConfig:
    """Camera pose optimization (reference: noisy_src/config.py:86-107)."""

    enabled: bool = True
    learn_rotation: bool = True
    learn_translation: bool = True
    pose_lr: float = 1e-4
    pose_opt_delay: int = 1000
    init_mode: str = "noisy"       # "clean" | "noisy"
    rotation_noise_deg: float = 0.0
    translation_noise_pct: float = 0.0
    noise_seed: Optional[int] = None
    pose_grad_clip: float = 0.1
    rotation_reg_weight: float = 0.01
    translation_reg_weight: float = 0.001
    # BARF-style coarse-to-fine positional-encoding annealing: ramp the
    # encoding bands in over this many iterations (0 = off, reference
    # behavior). Essential for recovering from severe pose noise.
    freq_anneal_iters: int = 0
    # Re-anchor the global SIM(3) gauge to the initial poses after every
    # pose update (core/se3.project_gauge_deltas). The photometric loss is
    # flat along a global similarity of world+cameras, so without this the
    # constellation random-walks away from the init gauge (raw pose error
    # and val PSNR degrade while aligned error improves). Uses NO ground
    # truth. No reference counterpart; at reference defaults the reg terms
    # suppress drift so this is a near-no-op there.
    gauge_anchor: bool = True
    # Auto-upgrade to the severe-recovery recipe when the configured noise
    # is >= 3 deg rotation or >= 3% translation AND the pose-opt knobs are
    # still the reference-standard defaults: the reference's reg terms
    # anchor poses to the noisy init at that noise level and the run stalls
    # silently (results/grid r3 poseopt_rot5_trans5: 2.69 deg residual).
    # Explicitly customized knobs always win; set False to force the
    # reference-parity behavior regardless.
    auto_preset: bool = True


@dataclass(frozen=True)
class TPUConfig:
    """TPU execution knobs — no reference counterpart (it is single-GPU)."""

    # Compute dtype for the MLP matmuls ("bfloat16" rides the MXU at 2x;
    # "float32" is the numerical-parity mode). Params stay float32 either way.
    compute_dtype: str = "float32"
    # Fixed ray-tile size for full-frame rendering (lax.map over tiles
    # replaces the reference's Python chunk loop, rendering.py:299-322).
    # 256 is the measured v5e optimum — the same VMEM-scale working-set
    # effect as the train batch sweep; per-frame render cost falls
    # monotonically from tile 8192 down to 256 (scripts/profile_eval.py:
    # 386.7k rays/s @256 vs 266.9k @4096, f32 400x400).
    eval_tile: int = 256
    # Train steps fused into one lax.scan dispatch (metrics still come back
    # one row per iteration, matching the reference CSV cadence).
    steps_per_scan: int = 100
    # Data-parallel mesh axis size; 0 = use all visible devices.
    num_devices: int = 0
    # Tensor (model) parallelism: shard the MLP hidden dimension this many
    # ways over a second mesh axis (parallel/tp.py — Megatron-style
    # alternating column/row trunk sharding, pure GSPMD placement). The
    # device mesh becomes (num_devices / tensor_parallel, tensor_parallel);
    # 1 = off (pure data parallel, the production default — the reference
    # 256-wide MLP fits one chip easily; this axis exists for much wider
    # models). Numerics are exact vs the replicated run (tests/test_tp.py).
    tensor_parallel: int = 1
    # Fused Pallas posenc+MLP kernel. "auto" = measured-fastest per
    # context on TPU, which since round 3 is plain XLA for BOTH the
    # train step (127.3k vs 72.2k rays/s at batch 256 on v5e) and
    # full-frame eval rendering (386.7k vs 228.8k at tile 256) — see
    # ops/pallas/__init__.py for the measurement history. "on"/"off"
    # or a bool force both contexts. Resolve via
    # experimental.pallas.pallas_enabled(cfg, context).
    use_pallas: object = "auto"
    # Pallas inverse-CDF resample kernel for hierarchical sampling
    # (ops/pallas/resample.py; exact-parity math). MEASURED A WASH inside
    # the training step on v5e (65.0k vs 65.2k rays/s): XLA already fuses
    # the compare mask into the reductions, so the round-1 "~15 ms
    # resample" profile was misattributed. Kept as an option ("on"/"off";
    # "auto" = off) — revisit if batch sizes grow past VPU-bound regimes.
    fused_resample: str = "auto"
    # Gradient accumulation: render/backprop the batch as scanned
    # microbatches of this many rays, average the grads, and apply ONE
    # optimizer update per full batch — same optimizer semantics
    # (mean-of-means loss/grad, same update cadence) at the small-batch
    # per-ray cost. NOT bit-identical to the fused step: each microbatch
    # draws its own render key (different stratified-jitter positions)
    # and float summation order differs, so a resumed pre-microbatch run
    # continues with an equivalent but not bitwise-identical trajectory. The v5e
    # batch sweep (DESIGN.md roofline) found per-ray cost minimized at 256
    # rays/step (XLA's backward materialization overhead shrinks at
    # VMEM-scale working sets), so large batches run fastest as scans of
    # 256-ray microbatches; this also bounds activation HBM at
    # O(microbatch), which is what makes million-ray batches feasible.
    # -1 = auto (256 on accelerators, off on CPU — the production
    # default), 0 = off (single fused step). Ignored unless
    # 0 < microbatch < batch and batch % microbatch == 0.
    microbatch: int = -1
    # Split the ray/pixel bank across the data-axis devices instead of
    # replicating it (data/banks.py:shard_bank). Bank HBM then scales 1/D
    # per chip — required for very large scenes (~576 MB replicated at
    # 100x800x800). Sampling becomes stratified-over-shards (identical
    # per-ray marginal probability, exactly batch/D draws per shard).
    shard_bank: bool = False
    # Store trunk backward residuals in float8_e4m3 (1 byte/elem instead of
    # bf16's 2): the step is activation-bandwidth-bound, so this trades dW
    # quantization noise for residual traffic. Experimental — measure both
    # speed and convergence before enabling for a real run.
    f8_residuals: bool = False
    # Rematerialize MLP activations in the backward pass. With bf16
    # activations the full-pipeline step fits HBM comfortably at default
    # batch sizes and skipping the recompute is ~20% faster; enable for
    # very large batches.
    remat: bool = False


@dataclass
class NeRFConfig:
    """Aggregate config (reference: noisy_src/config.py:110-125)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    pose_opt: Optional[PoseOptConfig] = None
    tpu: TPUConfig = field(default_factory=TPUConfig)

    def __post_init__(self):
        if isinstance(self.train.output_dir, str):
            self.train.output_dir = Path(self.train.output_dir)
        if isinstance(self.data.data_root, str):
            self.data.data_root = Path(self.data.data_root)
        if isinstance(self.train.resume, str):
            self.train.resume = Path(self.train.resume)


def config_to_dict(cfg) -> dict:
    """Recursively convert a (possibly nested) config dataclass to a dict."""
    if dataclasses.is_dataclass(cfg):
        return {k: config_to_dict(v) for k, v in dataclasses.asdict(cfg).items()}
    if isinstance(cfg, dict):
        return {k: config_to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [config_to_dict(v) for v in cfg]
    if isinstance(cfg, Path):
        return str(cfg)
    return cfg


def config_to_json(cfg) -> str:
    return json.dumps(config_to_dict(cfg), indent=2)


def _build(dc_type, d: dict):
    fields = {f.name: f for f in dataclasses.fields(dc_type)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        ftype = fields[k].type
        if v is None:
            kwargs[k] = None
        elif ftype in ("ModelConfig",) or k == "model":
            kwargs[k] = _build(ModelConfig, v)
        elif k == "render":
            kwargs[k] = _build(RenderConfig, v)
        elif k == "data":
            kwargs[k] = _build(DataConfig, v)
        elif k == "train":
            kwargs[k] = _build(TrainConfig, v)
        elif k == "pose_opt":
            kwargs[k] = _build(PoseOptConfig, v)
        elif k == "tpu":
            kwargs[k] = _build(TPUConfig, v)
        elif k == "skips" and isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return dc_type(**kwargs)


def config_from_dict(d: dict) -> NeRFConfig:
    """Rebuild a NeRFConfig from a dict (for checkpoint restore; reference
    rebuilds configs from the checkpoint dict in inference.py:49-72).

    Compat: hashgrid checkpoints written before `hash_impl` existed were
    trained under the XOR hash; defaulting them to "packed" would silently
    misread their hashed-level tables, so an absent key maps to "xor"."""
    model = d.get("model")
    if (
        isinstance(model, dict)
        and model.get("architecture") == "hashgrid"
        and "hash_impl" not in model
    ):
        d = {**d, "model": {**model, "hash_impl": "xor"}}
    return _build(NeRFConfig, d)
