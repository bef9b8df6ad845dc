#!/bin/bash
# Round-5d: full revalidation at the flipped default (prior_obs_impl=
# deferred) + the 6-DoF sweep (VERDICT r4 Next#8) + parity refresh.
# Sequential — ONE live TPU process at a time.  Run ONLY after the default
# flip commit: base rows here land in DRIFT_TRAIL.jsonl as the committed
# regression net at the shipped config.
set -u
OUT=/tmp/r5d
mkdir -p $OUT
cd /root/repo
export VELO_FIX_ACCEL=1
LR="python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150 --prebin"
TRAIL="--trail DRIFT_TRAIL.jsonl"

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

# 1. Headline fps at the flipped defaults (the number the docs quote).
probe shipped_both VELO_BENCH_MODE=both
# 2. deferred_tail fps (informational: saves the final build per solve).
probe tail_both VELO_BENCH_MODE=both VELO_BENCH_OVERRIDES="s:prior_obs_impl=deferred_tail"

# 3. Base rows -> DRIFT_TRAIL at the shipped default (config-identical to
#    the r5c _def lanes; re-run so the committed net carries true base rows
#    at the flip SHA).
run lidar_planar    $TRAIL --seeds 0,1,2,3,4
run fused_planar    $TRAIL --vision --seeds 0,1,2,3,4
run lidar_6dof      $TRAIL --sixdof --seeds 0,1,2,3,4
run fused_6dof      $TRAIL --vision --sixdof --seeds 0,1,2,3,4
run lidar_suburban  $TRAIL --world suburban --seeds 0,1,2
run fused_suburban  $TRAIL --vision --world suburban --seeds 0,1,2

# 4. CPU<->TPU parity at the shipped tip (refresh PARITY.json) — before the
#    sweeps so a wall-clock cutoff only costs nice-to-haves.
if [ ! -s $OUT/parity.log ]; then
  timeout 2400 python scripts/parity_check.py > $OUT/parity.log.part \
    2> $OUT/parity.err && mv $OUT/parity.log.part $OUT/parity.log
  echo "rc=$? parity" | tee -a $OUT/queue.log
fi

# 5. 6-DoF front (VERDICT r4 Next#8) on the deferred prior.
run lidar_6dof_obs8 --sixdof --seeds 0,1,2,3,4 --variants s:prior_obs_gain=8.0
run lidar_6dof_ref2 --sixdof --seeds 0,1,2,3,4 --variants s:prior_obs_ref=0.1
run lidar_6dof_lag  --sixdof --seeds 0,1,2,3,4 --variants s:deskew_exact_lag=1

echo "r5d queue complete $(date +%T)" | tee -a $OUT/queue.log
