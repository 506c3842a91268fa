#!/bin/bash
# VERDICT r2 item 4: drive a sharded run to an actual recovery milestone.
# Single-core CPU host: shrink the MLPs (--hidden_dim 64, 4 layers) so 6k
# iters finish in ~1-2h; the sharded semantics under test (shard_map bank
# sampling, psum'd pose+scene grads over the 8-device mesh) are
# size-independent. Identical single-device run follows for the overlay.
cd /root/repo
ARGS="--iters 6000 --resolution 64 --num_images 10 --batch_size 256 \
 --num_samples 16 --num_samples_fine 16 --hidden_dim 64 \
 --num_hidden_layers 4 --pos_freqs 8 --freq_anneal_iters 1500 \
 --pose_lr 1e-3 --pose_opt_delay 100 --rotation_reg_weight 0 \
 --translation_reg_weight 0 --steps_per_scan 100"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/northstar_check.py $ARGS --shard_bank --num_devices 8 \
  > results/sharded_milestone/sharded_8dev.json \
  2> results/sharded_milestone/sharded_8dev.log
echo "SHARDED EXIT $?"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=1 \
  python scripts/northstar_check.py $ARGS --num_devices 1 \
  > results/sharded_milestone/single_1dev.json \
  2> results/sharded_milestone/single_1dev.log
echo "SINGLE EXIT $?"
echo DONE_ALL
