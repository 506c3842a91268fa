#!/bin/bash
# Resume the 200k long-horizon run after the iter-96.4k SIGABRT (device
# runtime abort; see run.log). Relaunches from checkpoint_latest (95k)
# under the supervisor, which now also handles crash-signal deaths.
cd /root/repo
python scripts/supervise_train.py --run_dir results/longhorizon/clean200k -- \
  python -m noisy_src.train --data_source synthetic \
  --synthetic_resolution 400 --synthetic_textured \
  --num_iters 200000 --batch_size 1024 \
  --num_samples 64 --num_samples_fine 128 \
  --steps_per_scan 100 --wedge_timeout 600 \
  --output_dir results/longhorizon --exp_name clean200k \
  --resume results/longhorizon/clean200k \
  >> results/longhorizon/run.log 2>&1
echo "EXIT $?"
