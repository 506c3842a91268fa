"""Validation-time evaluation — full-frame renders + PSNR/SSIM(/LPIPS).

Reference semantics: noisy_src/train.py:163-233 (render up to `num_images`
val frames, compute metrics, save comparison PNGs for the first 3).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import NeRFConfig
from ..evalx.metrics import (
    LPIPSMetric,
    compute_mse,
    compute_ms_ssim,
    compute_psnr,
    compute_ssim,
)
from ..ops.rendering import render_image
from ..utils.logger import ExperimentLogger, ValidationMetrics
from ..utils.pipeline import pipeline_frames


def evaluate(
    models,
    val_scene,
    logger: Optional[ExperimentLogger],
    iteration: int,
    cfg: NeRFConfig,
    num_images: int = 5,
    lpips_metric: Optional[LPIPSMetric] = None,
    poses=None,
    mesh=None,
) -> ValidationMetrics:
    """Render `num_images` validation frames and aggregate metrics.

    `poses` overrides the scene's poses (pose-opt evaluates with GT val
    poses, reference train_pose_opt.py:473-545). With `mesh` (>1 device)
    each frame's rays are sharded over the mesh's data axis so validation
    rendering scales with the pod instead of serializing on one chip.
    """
    if poses is None:
        poses = val_scene.poses
    n = min(num_images, val_scene.images.shape[0])

    # Dispatch-ahead pipeline (utils/pipeline.py): frame i+1 renders while
    # frame i is fetched + PNG-logged. Device-side metrics run after the
    # loop so they don't queue behind the next render.
    preds, depths = [None] * n, [None] * n

    def dispatch(i):
        return render_image(
            models, poses[i], val_scene.H, val_scene.W, val_scene.focal,
            cfg.render, cfg.model, cfg.tpu, mesh=mesh,
        )

    def consume(i, out):
        preds[i] = np.asarray(out["rgb"])
        if i < 3:
            depths[i] = np.asarray(out["depth"])

    pipeline_frames(n, dispatch, consume)

    all_psnr, all_ssim, all_mse, all_lpips, all_msssim = [], [], [], [], []
    for i in range(n):
        pred = preds[i]
        target = np.asarray(val_scene.images[i])
        all_mse.append(float(compute_mse(pred, target)))
        all_psnr.append(float(compute_psnr(pred, target)))
        all_ssim.append(float(compute_ssim(pred, target)))
        all_msssim.append(float(compute_ms_ssim(pred, target)))
        if lpips_metric is not None and lpips_metric.available:
            v = lpips_metric(pred, target)
            if v is not None:
                all_lpips.append(v)
        if logger is not None and i < 3:
            logger.log_images(
                tag=f"val_{i}", pred=pred, gt=target,
                iteration=iteration, depth=depths[i],
            )

    return ValidationMetrics(
        iteration=iteration,
        psnr=float(np.mean(all_psnr)),
        ssim=float(np.mean(all_ssim)),
        mse=float(np.mean(all_mse)),
        lpips=float(np.mean(all_lpips)) if all_lpips else None,
        ms_ssim=float(np.mean(all_msssim)),
        per_image_psnr=all_psnr,
        per_image_ssim=all_ssim,
    )
