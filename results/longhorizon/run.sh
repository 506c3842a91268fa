#!/bin/bash
# VERDICT r2 item 8: long-horizon standard training at the reference's
# full default schedule — 200k iterations (config.py lr_decay tail,
# checkpoint cadence every 10k, val every 5k, buffered per-iter CSV) on
# the real chip, supervised by the wedge watchdog. 400x400 textured
# analytic scene (Blender set absent), batch 1024, 64+128 samples.
cd /root/repo
python scripts/supervise_train.py --run_dir results/longhorizon/clean200k -- \
  python -m noisy_src.train --data_source synthetic \
  --synthetic_resolution 400 --synthetic_textured \
  --num_iters 200000 --batch_size 1024 \
  --num_samples 64 --num_samples_fine 128 \
  --steps_per_scan 100 --wedge_timeout 600 \
  --output_dir results/longhorizon --exp_name clean200k \
  > results/longhorizon/run.log 2>&1
echo "EXIT $?"
