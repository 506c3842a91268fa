#!/bin/bash
# BASELINE.json config 4's comparison-video render path, produced for
# real: train a fixed-noisy model and a pose-optimized model on the same
# severe 5 deg / 5% noise draw, then render the same spiral from both
# (noise re-injected per-frame on the noisy side, clean on the optimized
# side) and stitch side-by-side. No ffmpeg in this image -> the assembler
# falls back to an animated GIF (scripts/create_comparison_video.py).
cd /root/repo
set -x
python -m noisy_src.train --data_source synthetic \
  --synthetic_resolution 400 --synthetic_textured \
  --num_iters 10000 --batch_size 1024 --steps_per_scan 100 \
  --rotation_noise 5.0 --translation_noise_pct 5.0 --noise_seed 42 \
  --val_every 5000 --output_dir results/comparison_video \
  --exp_name noisy_model || exit 1
python -m noisy_src.train_pose_opt --data_source synthetic \
  --synthetic_resolution 400 --synthetic_textured \
  --num_iters 24000 --batch_size 1024 --steps_per_scan 100 \
  --rotation_noise 5.0 --translation_noise_pct 5.0 --noise_seed 42 \
  --severe_recovery --val_every 8000 --output_dir results/comparison_video \
  --exp_name optimized_model || exit 1
python scripts/create_comparison_video.py \
  --noisy_checkpoint results/comparison_video/noisy_model \
  --optimized_checkpoint results/comparison_video/optimized_model \
  --output_dir results/comparison_video/video \
  --n_frames 60 --fps 15 --resolution_scale 0.5 \
  --rotation_noise 5.0 --translation_noise_pct 5.0 --noise_seed 42
echo "EXIT $?"
