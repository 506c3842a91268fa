#!/bin/bash
cd /root/repo
python scripts/northstar_check.py --iters 40000 \
  --freq_anneal_iters 3000 --pose_lr 1e-3 --pose_opt_delay 100 \
  --rotation_reg_weight 0 --translation_reg_weight 0 --seed 3 \
  > results/seedrobust/seed3.json \
  2> results/seedrobust/seed3.log
echo "SEED 3 EXIT $?"
