#!/bin/bash
# Round-5 revalidation queue. Sequential — ONE live TPU process at a time
# (the axon tunnel deadlocks on a second client), and nothing else heavy on
# the 1-core host while fps probes run. Resumable: non-empty outputs skip.
#
# Order: hardware smoke -> headline fps (the staged-obs-basis recovery must
# confirm >=100 fused) -> pallas KLT fps probe -> full-scale drift
# revalidation at shipped defaults (writes DRIFT_TRAIL.jsonl, the committed
# regression net) -> pallas drift A/B -> 6-DoF obs/lag sweep -> parity.
set -u
OUT=/tmp/r5v
mkdir -p $OUT
cd /root/repo
export VELO_FIX_ACCEL=1
LR="python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150 --prebin"
TRAIL="--trail DRIFT_TRAIL.jsonl"

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

probe() {
  local tag=$1; shift
  if grep -q "\"tag\": \"$tag\"" $OUT/fps_probes.jsonl 2>/dev/null; then
    echo "skip $tag"; return
  fi
  echo "=== probe $tag ($(date +%T))" | tee -a $OUT/queue.log
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>$OUT/probe_$tag.err | tail -1)
  local rc=$?
  if [ -n "$line" ]; then
    echo "${line%\}}, \"tag\": \"$tag\"}" >> $OUT/fps_probes.jsonl
  fi
  echo "rc=$rc $tag: $line" | tee -a $OUT/queue.log
}

# 0. Pallas hardware-lowering smoke lane (catches Mosaic rejections the
#    CPU-interpret unit tests cannot).
if [ ! -s $OUT/tpu_smoke.jsonl ]; then
  timeout 1200 python scripts/tpu_smoke.py > $OUT/tpu_smoke.jsonl.part \
    2> $OUT/tpu_smoke.err && mv $OUT/tpu_smoke.jsonl.part $OUT/tpu_smoke.jsonl
  echo "rc=$? tpu_smoke" | tee -a $OUT/queue.log
fi

# 1. Headline dual-mode fps at shipped defaults (staged obs basis).
probe shipped_both VELO_BENCH_MODE=both
# 2. Pallas level-0 KLT fps candidates (fb_levels=2 is the default).
probe pallas VELO_BENCH_MODE=fused VELO_BENCH_OVERRIDES="v:klt_impl=pallas"

# 3. Full-scale drift revalidation at shipped defaults -> DRIFT_TRAIL.
run lidar_planar    $TRAIL --seeds 0,1,2,3,4
run fused_planar    $TRAIL --vision --seeds 0,1,2,3,4
run lidar_6dof      $TRAIL --sixdof --seeds 0,1,2,3,4
run fused_6dof      $TRAIL --vision --sixdof --seeds 0,1,2,3,4
run lidar_suburban  $TRAIL --world suburban --seeds 0,1,2
run fused_suburban  $TRAIL --vision --world suburban --seeds 0,1,2

# 4. Pallas KLT drift A/B (only decides the default together with #2's fps).
run fused_planar_pallas --vision --seeds 0,1,2,3,4 \
  --variants v:klt_impl=pallas

# 5. 6-DoF front (VERDICT r4 Next#8): obs gain/ref sweep + exact-lag combo
#    now that the staged basis makes the prior cheap.
run lidar_6dof_obs8    --sixdof --seeds 0,1,2,3,4 --variants s:prior_obs_gain=8.0
run lidar_6dof_ref2    --sixdof --seeds 0,1,2,3,4 --variants s:prior_obs_ref=0.1
run lidar_6dof_lag     --sixdof --seeds 0,1,2,3,4 --variants s:deskew_exact_lag=1
run lidar_planar_obs8  --seeds 0,1,2,3,4 --variants s:prior_obs_gain=8.0

# 6. CPU<->TPU parity at the shipped tip (refresh PARITY.json).
if [ ! -s $OUT/parity.log ]; then
  timeout 2400 python scripts/parity_check.py > $OUT/parity.log.part \
    2> $OUT/parity.err && mv $OUT/parity.log.part $OUT/parity.log
  echo "rc=$? parity" | tee -a $OUT/queue.log
fi

echo "r5 queue complete $(date +%T)" | tee -a $OUT/queue.log
