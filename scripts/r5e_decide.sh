#!/bin/bash
# Round-5e decision queue: staged vs deferred on fresh seeds + held-out
# world.  The 0-4 seed draws disagree per-family within single-seed chaos
# (staged: lidar 0.720 / fused 1.478; deferred: lidar 1.391 / fused 0.888)
# — decide on 10-seed means + suburban instead of overfitting one draw.
set -u
OUT=/tmp/r5e
mkdir -p $OUT
cd /root/repo
export VELO_FIX_ACCEL=1
LR="python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150 --prebin"
DEF="s:prior_obs_impl=deferred"

run() {
  local name=$1; shift
  if [ -s $OUT/$name.jsonl ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $* ($(date +%T))" | tee -a $OUT/queue.log
  sleep 15  # let the previous TPU client fully release the tunnel
  timeout 3600 $LR "$@" > $OUT/$name.jsonl.part 2> $OUT/$name.err
  local rc=$?
  [ $rc -eq 0 ] && [ -s $OUT/$name.jsonl.part ] && \
    mv $OUT/$name.jsonl.part $OUT/$name.jsonl
  echo "rc=$rc $name ($(date +%T))" | tee -a $OUT/queue.log
}

# Fresh-seed draws (5-9), both impls, both planar families.
run lidar59_def   --seeds 5,6,7,8,9 --variants $DEF
run lidar59_stg   --seeds 5,6,7,8,9 --variants base
run fused59_def   --vision --seeds 5,6,7,8,9 --variants $DEF
run fused59_stg   --vision --seeds 5,6,7,8,9 --variants base
# Held-out world, both impls.
run sub_lidar_def --world suburban --seeds 0,1,2 --variants $DEF
run sub_lidar_stg --world suburban --seeds 0,1,2 --variants base
run sub_fused_def --vision --world suburban --seeds 0,1,2 --variants $DEF
run sub_fused_stg --vision --world suburban --seeds 0,1,2 --variants base
echo "r5e queue complete $(date +%T)" | tee -a $OUT/queue.log
