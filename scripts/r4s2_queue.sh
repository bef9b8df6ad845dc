#!/bin/bash
# Round-4 follow-up queue: decision arms opened by the r4s results.
#   * prior_obs_gain=4 won lidar planar (0.885 vs 1.119) and 6-DoF
#     (2.42 vs 3.00) — measure it fused + combined with exact-lag.
#   * klt_impl=pallas needs a full-scale fused drift arm before it can
#     take the default for fps.
# Run AFTER scripts/r4_queue.sh (one live TPU process at a time).
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

run fused_planar_obs --vision --seeds 0,1,2,3,4 \
                     --variants s:prior_obs_gain=4.0
run fused_pallas     --vision --seeds 0,1,2,3,4 \
                     --variants v:klt_impl=pallas
run lidar_6dof_obslag --sixdof --seeds 0,1,2,3,4 \
                      --variants s:prior_obs_gain=4.0+deskew_exact_lag=1
run fused_6dof_obs   --vision --sixdof --seeds 0,1,2,3,4 \
                     --variants s:prior_obs_gain=4.0
echo "r4s2 queue complete $(date +%T)" | tee -a $OUT/queue.log
