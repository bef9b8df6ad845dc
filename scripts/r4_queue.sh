#!/bin/bash
# Round-4 full-scale TPU revalidation queue (VERDICT r3 Next-round #1/#3/#4).
#
# Runs the 150-frame 64x2048 drift harness at shipped defaults and the
# decision-pending variants, sequentially (ONE live TPU process at a time —
# the axon tunnel deadlocks on a second client).  Each run is resumable:
# a non-empty output JSONL skips the run, so a wedged tunnel or reboot
# loses at most the in-flight invocation.  Fixture generation uses the
# JAX-accelerated simulator (VELO_FIX_ACCEL=1) and is disk-cached.
set -u
mkdir -p /tmp/r4v
cd /root/repo
export VELO_FIX_ACCEL=1
LR="python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150 --prebin"

run() {
  local name=$1; shift
  if [ -s /tmp/r4v/$name.jsonl ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $* ($(date +%T))" | tee -a /tmp/r4v/queue.log
  timeout 3600 $LR "$@" > /tmp/r4v/$name.jsonl.part 2> /tmp/r4v/$name.err
  local rc=$?
  if [ $rc -eq 0 ] && [ -s /tmp/r4v/$name.jsonl.part ]; then
    mv /tmp/r4v/$name.jsonl.part /tmp/r4v/$name.jsonl
  fi
  echo "rc=$rc $name ($(date +%T))" | tee -a /tmp/r4v/queue.log
}

# --- Priority 1: headline refresh at shipped defaults -----------------------
run fused_planar   --vision --seeds 0,1,2,3,4
run lidar_planar   --seeds 0,1,2,3,4 --variants base,s:prior_obs_gain=4.0
# fb_levels=2: the queued fused-fps recovery candidate (drift side).
run fused_fb2      --vision --seeds 0,1,2,3,4 --variants v:fb_levels=2
# --- Priority 2: exact-lag full-scale A/B (decides its default) -------------
run lidar_planar_lag --seeds 0,1,2,3,4 --variants s:deskew_exact_lag=1
run lidar_6dof     --sixdof --seeds 0,1,2,3,4 \
                   --variants base,s:deskew_exact_lag=1,s:prior_obs_gain=4.0
# --- Priority 3: 6-DoF fused + held-out world (obs-prior decision) ----------
run fused_6dof     --vision --sixdof --seeds 0,1,2,3,4
run lidar_suburban --world suburban --seeds 0,1,2 \
                   --variants base,s:prior_obs_gain=4.0,s:deskew_exact_lag=1
run fused_suburban --vision --world suburban --seeds 0,1,2
# --- Priority 4: realism + held-out seeds ------------------------------------
run lidar_noise    --noise 0.02 --seeds 0,1,2,3,4
run fused_noise    --vision --noise 0.02 --seeds 0,1,2,3,4
run lidar_noise_drop --noise 0.02 --dropout 0.05 --seeds 0,1,2,3,4
run lidar_heldout  --seeds 5,6,7,8,9
run fused_heldout  --vision --seeds 5,6,7,8,9
echo "queue complete $(date +%T)" | tee -a /tmp/r4v/queue.log
