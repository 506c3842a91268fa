#!/bin/bash
# Continuation: seeds 2 and 3 (seeds 1, 0 already recorded pass).
cd /root/repo
for s in 2 3; do
  python scripts/northstar_check.py --iters 40000 \
    --freq_anneal_iters 3000 --pose_lr 1e-3 --pose_opt_delay 100 \
    --rotation_reg_weight 0 --translation_reg_weight 0 --seed $s \
    > results/seedrobust/seed$s.json \
    2> results/seedrobust/seed$s.log
  echo "SEED $s EXIT $?"
done
echo DONE_ALL
