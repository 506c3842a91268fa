#!/bin/bash
# VERDICT r2 item 4, extended: the 6k run (run.sh) proved sharded ==
# single-device equivalence but ended at 2.82 deg aligned — still
# converging, no milestone. This drives the SAME tiny sharded config to
# 40k iters with the seed-robust severe-recovery anneal horizon
# (freq_anneal 3000, the recipe that reached <0.15 deg on the full
# config — results/seedrobust/). Single-core CPU host: small MLPs keep
# 40k iters ~1.3h; the sharded semantics under test (shard_map bank
# sampling, psum'd pose+scene grads over the 8-device mesh) are
# size-independent. Identical single-device 40k control for the overlay.
cd /root/repo
ARGS="--iters 40000 --resolution 64 --num_images 10 --batch_size 256 \
 --num_samples 16 --num_samples_fine 16 --hidden_dim 64 \
 --num_hidden_layers 4 --pos_freqs 8 --freq_anneal_iters 3000 \
 --pose_lr 1e-3 --pose_opt_delay 100 --rotation_reg_weight 0 \
 --translation_reg_weight 0 --steps_per_scan 100"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/northstar_check.py $ARGS --shard_bank --num_devices 8 \
  > results/sharded_milestone/sharded_8dev_40k.json \
  2> results/sharded_milestone/sharded_8dev_40k.log
echo "SHARDED EXIT $?"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=1 \
  python scripts/northstar_check.py $ARGS --num_devices 1 \
  > results/sharded_milestone/single_1dev_40k.json \
  2> results/sharded_milestone/single_1dev_40k.log
echo "SINGLE EXIT $?"
echo DONE_ALL
