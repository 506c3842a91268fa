"""Experiment logging — CSV + JSON summary + validation PNGs (+optional TB).

Output layout and file naming are part of the behavioral API
(reference: noisy_src/logger.py:25-368):
  {output_dir}/logs/train_metrics.csv     one row per iteration
  {output_dir}/logs/val_metrics.csv
  {output_dir}/config.json
  {output_dir}/summary.json
  {output_dir}/images/{tag}_{pred,gt,comparison,depth}_{iter:07d}.png
CSV writes are buffered (the reference flushes every row, logger.py:140) —
rows still appear once per iteration, they just hit disk in batches.
"""

from __future__ import annotations

import csv
import json
import time
from dataclasses import asdict, dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class TrainingMetrics:
    """Reference schema: noisy_src/logger.py:25-38."""

    iteration: int
    loss: float
    loss_coarse: float
    loss_fine: Optional[float] = None
    psnr: float = 0.0
    learning_rate: float = 0.0
    time_per_iter: float = 0.0
    rays_per_sec: float = 0.0
    # Pose-opt extras — the reference computes these into its step metrics
    # dict (train_pose_opt.py:358-390); None (dropped from the CSV) on the
    # standard path so its schema stays reference-identical.
    psnr_fine: Optional[float] = None
    rotation_reg: Optional[float] = None
    translation_reg: Optional[float] = None
    pose_reg_loss: Optional[float] = None

    def to_dict(self) -> Dict[str, Any]:
        return {k: v for k, v in asdict(self).items() if v is not None}


@dataclass
class ValidationMetrics:
    """Reference schema: noisy_src/logger.py:41-57."""

    iteration: int
    psnr: float
    ssim: float = 0.0
    lpips: Optional[float] = None
    mse: float = 0.0
    # self-contained perceptual metric (evalx/metrics.compute_ms_ssim) —
    # reported wherever LPIPS is unavailable. Declared AFTER mse so the
    # CSV header (taken from field order) keeps the reference's
    # iteration,psnr,ssim,lpips,mse prefix byte-identical
    # (noisy_src/logger.py:41-57) and ms_ssim is a truly appended column.
    ms_ssim: Optional[float] = None
    per_image_psnr: List[float] = field(default_factory=list)
    per_image_ssim: List[float] = field(default_factory=list)

    def to_dict(self) -> Dict[str, Any]:
        d = asdict(self)
        return {k: v for k, v in d.items() if v is not None and v != []}


class TensorBoardLogger:
    """Lazy TB wrapper (reference: noisy_src/logger.py:60-108). Degrades to a
    no-op when no SummaryWriter implementation is importable."""

    def __init__(self, log_dir: Path):
        self._writer = None
        for mod in ("torch.utils.tensorboard", "tensorboardX"):
            try:
                import importlib

                sw = importlib.import_module(mod).SummaryWriter
                self._writer = sw(log_dir=str(log_dir))
                break
            except Exception:
                continue

    @property
    def available(self) -> bool:
        return self._writer is not None

    def log_scalar(self, tag: str, value: float, step: int):
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def log_image(self, tag: str, img: np.ndarray, step: int):
        if self._writer is not None:
            self._writer.add_image(tag, np.transpose(img, (2, 0, 1)), step)

    def close(self):
        if self._writer is not None:
            self._writer.close()


class CSVLogger:
    """Buffered CSV sink (reference: noisy_src/logger.py:111-156) — header
    inferred from the first row's keys, flushed every `flush_every` rows."""

    def __init__(self, log_dir: Path, flush_every: int = 200,
                 append: bool = False):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._flush_every = flush_every
        self._append = append
        self._files: Dict[str, Any] = {}
        self._writers: Dict[str, Any] = {}
        self._pending: Dict[str, int] = {}

    def _writer_for(self, name: str, fieldnames: List[str]):
        if name not in self._writers:
            path = self.log_dir / f"{name}.csv"
            # append mode (--resume into the same run dir, e.g. the
            # wedge-watchdog relaunch): keep pre-resume rows instead of
            # truncating — but only when the on-disk header matches the
            # current metric keys; a config/code change between runs
            # would otherwise append misaligned rows. On mismatch the old
            # file is rotated aside, not silently overwritten.
            has_rows = self._append and path.exists() and path.stat().st_size > 0
            if has_rows:
                with open(path, newline="") as rf:
                    on_disk = next(csv.reader(rf), None)
                if on_disk != fieldnames:
                    rotated = path.with_suffix(".csv.old")
                    n = 1
                    while rotated.exists():  # never clobber prior rotations
                        n += 1
                        rotated = path.with_suffix(f".csv.old{n}")
                    path.replace(rotated)
                    print(
                        f"CSVLogger: {path.name} header changed on resume; "
                        f"rotated old file to {rotated.name}"
                    )
                    has_rows = False
            f = open(path, "a" if has_rows else "w", newline="")
            w = csv.DictWriter(f, fieldnames=fieldnames)
            if not has_rows:
                w.writeheader()
            self._files[name] = f
            self._writers[name] = w
            self._pending[name] = 0
        return self._writers[name]

    def log_row(self, name: str, row: Dict[str, Any]):
        w = self._writer_for(name, list(row.keys()))
        w.writerow({k: row.get(k) for k in w.fieldnames})
        self._pending[name] += 1
        if self._pending[name] >= self._flush_every:
            self._files[name].flush()
            self._pending[name] = 0

    def log_train(self, m: TrainingMetrics):
        self.log_row("train_metrics", m.to_dict())

    def log_val(self, m: ValidationMetrics):
        d = m.to_dict()
        d.pop("per_image_psnr", None)
        d.pop("per_image_ssim", None)
        self.log_row("val_metrics", d)
        self._files["val_metrics"].flush()

    def close(self):
        for f in self._files.values():
            f.flush()
            f.close()
        self._files.clear()
        self._writers.clear()


def depth_to_colormap(depth: np.ndarray, near=None, far=None) -> np.ndarray:
    """Turbo-like depth colormap (reference: noisy_src/logger.py:289-300).
    Returns (H, W, 3) uint8-range float in [0, 1].

    `near`/`far` optionally fix the normalization range (reference:
    noisy_src/utils.py:80-121 exposes the same knobs) — useful for
    cross-frame-consistent video colormaps; default is per-frame min/max.
    """
    d = np.asarray(depth, dtype=np.float32)
    lo = float(d.min()) if near is None else float(near)
    hi = float(d.max()) if far is None else float(far)
    norm = np.clip((d - lo) / (hi - lo + 1e-8), 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4.0 * norm - 3.0), 0.0, 1.0)
    g = np.clip(1.5 - np.abs(4.0 * norm - 2.0), 0.0, 1.0)
    b = np.clip(1.5 - np.abs(4.0 * norm - 1.0), 0.0, 1.0)
    return np.stack([r, g, b], axis=-1)


def save_png(img: np.ndarray, path: Path):
    from PIL import Image

    arr = np.clip(np.asarray(img, dtype=np.float32), 0.0, 1.0)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


class ExperimentLogger:
    """All-sink experiment logger (reference: noisy_src/logger.py:159-368)."""

    def __init__(self, output_dir: Path, use_tensorboard: bool = True,
                 resume: bool = False):
        self.output_dir = Path(output_dir)
        self.log_dir = self.output_dir / "logs"
        self.image_dir = self.output_dir / "images"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.image_dir.mkdir(parents=True, exist_ok=True)

        self.csv = CSVLogger(self.log_dir, append=resume)
        self.tb = TensorBoardLogger(self.log_dir) if use_tensorboard else None
        self.start_time = time.time()
        self._summary: Dict[str, Any] = {
            "experiment_name": self.output_dir.name,
            "start_time": datetime.now().isoformat(),
            "output_dir": str(self.output_dir),
        }
        self._best_val_psnr = float("-inf")
        self._best_val_ssim = 0.0
        self._last_val: Optional[ValidationMetrics] = None
        self._total_iterations = 0

    def log_config(self, config_dict: Dict[str, Any]):
        self._summary["config"] = config_dict
        with open(self.output_dir / "config.json", "w") as f:
            json.dump(config_dict, f, indent=2)

    def log_model_info(self, name: str, total_params: int, trainable_params: int):
        """Reference: noisy_src/logger.py:302-310 (summary.json key names)."""
        self._summary[f"{name}_total_params"] = int(total_params)
        self._summary[f"{name}_trainable_params"] = int(trainable_params)

    def log_training(self, m: TrainingMetrics):
        self.csv.log_train(m)
        self._total_iterations = max(self._total_iterations, m.iteration + 1)
        if self.tb is not None and self.tb.available:
            self.tb.log_scalar("train/loss", m.loss, m.iteration)
            self.tb.log_scalar("train/loss_coarse", m.loss_coarse, m.iteration)
            if m.loss_fine is not None:
                self.tb.log_scalar("train/loss_fine", m.loss_fine, m.iteration)
            self.tb.log_scalar("train/psnr", m.psnr, m.iteration)
            self.tb.log_scalar("train/learning_rate", m.learning_rate, m.iteration)
            self.tb.log_scalar("train/rays_per_sec", m.rays_per_sec, m.iteration)
            if m.pose_reg_loss is not None:
                self.tb.log_scalar("train/pose_reg_loss", m.pose_reg_loss, m.iteration)

    def log_validation(self, m: ValidationMetrics):
        self.csv.log_val(m)
        self._last_val = m
        if m.psnr > self._best_val_psnr:
            self._best_val_psnr = m.psnr
            self._best_val_ssim = m.ssim
        if self.tb is not None and self.tb.available:
            self.tb.log_scalar("val/psnr", m.psnr, m.iteration)
            self.tb.log_scalar("val/ssim", m.ssim, m.iteration)
            self.tb.log_scalar("val/mse", m.mse, m.iteration)
            if m.lpips is not None:
                self.tb.log_scalar("val/lpips", m.lpips, m.iteration)
            if m.ms_ssim is not None:
                self.tb.log_scalar("val/ms_ssim", m.ms_ssim, m.iteration)

    def log_images(self, tag: str, pred, gt, iteration: int, depth=None):
        """PNG naming parity: {tag}_{pred,gt,comparison,depth}_{iter:07d}.png
        (reference: noisy_src/logger.py:239-300)."""
        pred = np.asarray(pred)
        gt = np.asarray(gt)
        save_png(pred, self.image_dir / f"{tag}_pred_{iteration:07d}.png")
        save_png(gt, self.image_dir / f"{tag}_gt_{iteration:07d}.png")
        save_png(
            np.concatenate([gt, pred], axis=1),
            self.image_dir / f"{tag}_comparison_{iteration:07d}.png",
        )
        if depth is not None:
            save_png(
                depth_to_colormap(np.asarray(depth)),
                self.image_dir / f"{tag}_depth_{iteration:07d}.png",
            )

    def save_summary(self, extra: Optional[Dict[str, Any]] = None):
        """summary.json with final/best metrics + wall time
        (reference: noisy_src/logger.py:337-362)."""
        self._summary["end_time"] = datetime.now().isoformat()
        self._summary["total_time_seconds"] = time.time() - self.start_time
        self._summary["total_iterations"] = self._total_iterations
        if self._last_val is not None:
            self._summary["final_val_psnr"] = self._last_val.psnr
            self._summary["final_val_ssim"] = self._last_val.ssim
            self._summary["best_val_psnr"] = max(self._best_val_psnr, self._last_val.psnr)
            self._summary["best_val_ssim"] = self._best_val_ssim
        if extra:
            self._summary.update(extra)
        with open(self.output_dir / "summary.json", "w") as f:
            json.dump(self._summary, f, indent=2)

    def close(self):
        self.csv.close()
        if self.tb is not None:
            self.tb.close()
