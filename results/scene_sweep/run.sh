#!/bin/bash
# BASELINE.json stretch config (SURVEY §7 item 14): 8-scene sweep at
# 800x800 with test-set renders + PSNR/SSIM(/LPIPS-gated) aggregation.
# The Blender set is absent (zero egress), so this sweeps the 8-member
# procedural family (data/synthetic.py SYNTHETIC_SCENES) — 8
# geometrically distinct analytic scenes at the Blender sweep's full
# resolution. 10k iters x batch 1024 per scene on the real chip.
cd /root/repo
python scripts/sweep_scenes.py --data_source synthetic \
  --synthetic_resolution 800 --synthetic_textured --img_scale 1.0 \
  --num_iters 10000 --batch_size 1024 --max_test_images 3 \
  --output_dir results/scene_sweep/runs \
  > results/scene_sweep/sweep.log 2>&1
echo "EXIT $?"
