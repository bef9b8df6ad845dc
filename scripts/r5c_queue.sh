#!/bin/bash
# Round-5c: deferred-reject dynamic LM (prior_obs_impl=deferred) A/B.
# Sequential, ONE live TPU process at a time.  Decides the default flip:
# needs fused fps >= 100 AND fused planar back at the dynamic-formulation
# accuracy (~0.73) with lidar planar/6dof not regressing.
set -u
OUT=/tmp/r5c
mkdir -p $OUT
cd /root/repo
export VELO_FIX_ACCEL=1
LR="python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150 --prebin"
DEF="s:prior_obs_impl=deferred"

run() {
  local name=$1; shift
  if [ -s $OUT/$name.jsonl ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $* ($(date +%T))" | tee -a $OUT/queue.log
  timeout 3600 $LR "$@" > $OUT/$name.jsonl.part 2> $OUT/$name.err
  local rc=$?
  [ $rc -eq 0 ] && [ -s $OUT/$name.jsonl.part ] && \
    mv $OUT/$name.jsonl.part $OUT/$name.jsonl
  echo "rc=$rc $name ($(date +%T))" | tee -a $OUT/queue.log
}

probe() {
  local tag=$1; shift
  if grep -q "\"tag\": \"$tag\"" $OUT/fps_probes.jsonl 2>/dev/null; then
    echo "skip $tag"; return
  fi
  echo "=== probe $tag ($(date +%T))" | tee -a $OUT/queue.log
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>$OUT/probe_$tag.err | tail -1)
  local rc=$?
  [ -n "$line" ] && echo "${line%\}}, \"tag\": \"$tag\"}" >> $OUT/fps_probes.jsonl
  echo "rc=$rc $tag: $line" | tee -a $OUT/queue.log
}

# 1. fps first — if deferred cannot hold >=100 fused the drift table matters
#    less (but still informative for the 6-DoF front).
probe deferred_both VELO_BENCH_MODE=both VELO_BENCH_OVERRIDES=$DEF

# 2. Drift A/B on the regressed families + the healthy control.
run fused_planar_def  --vision --seeds 0,1,2,3,4 --variants $DEF
run lidar_6dof_def    --sixdof --seeds 0,1,2,3,4 --variants $DEF
run lidar_planar_def  --seeds 0,1,2,3,4 --variants $DEF
echo "r5c queue complete $(date +%T)" | tee -a $OUT/queue.log
