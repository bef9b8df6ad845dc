#!/bin/bash
# Round-4 full-scale TPU revalidation queue, v2: re-run on top of the
# sweep-seam curvature fix (VERDICT r3 Next-round #1/#3/#4).
#
# The pre-seam-fix arms live in /tmp/r4v (kept as the "before" side of the
# seam A/B: lidar planar base mean 3.245, fused base 2.70, fb2 1.96,
# exact-lag 2.38).  This queue re-measures every decision on the fixed
# pipeline into /tmp/r4s.  Sequential — ONE live TPU process at a time.
# Resumable: a non-empty output JSONL skips the run.
set -u
OUT=/tmp/r4s
mkdir -p $OUT
cd /root/repo
export VELO_FIX_ACCEL=1
LR="python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150 --prebin"

run() {
  local name=$1; shift
  if [ -s $OUT/$name.jsonl ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $* ($(date +%T))" | tee -a $OUT/queue.log
  timeout 3600 $LR "$@" > $OUT/$name.jsonl.part 2> $OUT/$name.err
  local rc=$?
  if [ $rc -eq 0 ] && [ -s $OUT/$name.jsonl.part ]; then
    mv $OUT/$name.jsonl.part $OUT/$name.jsonl
  fi
  echo "rc=$rc $name ($(date +%T))" | tee -a $OUT/queue.log
}

# --- Priority 1: headline refresh at shipped defaults (seam fix in) ---------
run fused_planar   --vision --seeds 0,1,2,3,4
# fb_levels=2: the fused-fps recovery candidate (drift side, on seam fix).
run fused_fb2      --vision --seeds 0,1,2,3,4 --variants v:fb_levels=2
# --- Priority 2: A/Bs that decide defaults (all on seam fix) ----------------
run lidar_planar_ab --seeds 0,1,2,3,4 \
                    --variants s:deskew_exact_lag=1,s:prior_obs_gain=4.0
run lidar_6dof     --sixdof --seeds 0,1,2,3,4 \
                   --variants base,s:deskew_exact_lag=1,s:prior_obs_gain=4.0
# --- Priority 3: 6-DoF fused + held-out world --------------------------------
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
echo "queue complete $(date +%T)" | tee -a $OUT/queue.log
