#!/bin/bash
# VERDICT r2 item 3: seed-robust severe-noise recovery — ONE recipe across
# 4 independent noise/init draws, 40k iters each, on the real chip.
# Recipe = the 12k-record strong-annealing schedule with reg off.
cd /root/repo
for s in 1 0 2 3; do
  python scripts/northstar_check.py --iters 40000 \
    --freq_anneal_iters 3000 --pose_lr 1e-3 --pose_opt_delay 100 \
    --rotation_reg_weight 0 --translation_reg_weight 0 --seed $s \
    > results/seedrobust/seed$s.json \
    2> results/seedrobust/seed$s.log
  echo "SEED $s EXIT $?"
done
echo DONE_ALL
