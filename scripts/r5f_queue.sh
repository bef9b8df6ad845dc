#!/bin/bash
# Round-5f: post-revalidation follow-ups at the shipped (staged) default.
# Sequential — ONE live TPU process at a time.  Run after r5d completes:
#   1. Pallas hardware smoke (Mosaic lowering can't be caught on CPU).
#   2. Noise/dropout table refresh (README's robustness numbers must be
#      measured at the shipped round-5 config, not round 3's).
#   3. Device-trace recapture -> ms budget at the shipped defaults.
#   4. Driver entry + multichip dryrun smoke at the tip.
set -u
OUT=/tmp/r5f
mkdir -p $OUT
cd /root/repo
export VELO_FIX_ACCEL=1
LR="python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150 --prebin"

run() {
  local name=$1; shift
  if [ -s $OUT/$name.jsonl ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $* ($(date +%T))" | tee -a $OUT/queue.log
  sleep 15
  timeout 3600 $LR "$@" > $OUT/$name.jsonl.part 2> $OUT/$name.err
  local rc=$?
  [ $rc -eq 0 ] && [ -s $OUT/$name.jsonl.part ] && \
    mv $OUT/$name.jsonl.part $OUT/$name.jsonl
  echo "rc=$rc $name ($(date +%T))" | tee -a $OUT/queue.log
}

# 1. Hardware Pallas smoke (klt_l0 + dist_topk compile AND execute).
if [ ! -s $OUT/smoke.log ]; then
  sleep 15
  timeout 1200 python scripts/tpu_smoke.py > $OUT/smoke.log.part 2>&1 \
    && mv $OUT/smoke.log.part $OUT/smoke.log
  echo "rc=$? tpu_smoke" | tee -a $OUT/queue.log
fi

# 2. Robustness tables at shipped defaults (README quotes these).
run lidar_noise      --noise 0.02 --seeds 0,1,2,3,4
run fused_noise      --vision --noise 0.02 --seeds 0,1,2,3,4
run lidar_noise_drop --noise 0.02 --dropout 0.05 --seeds 0,1,2,3,4

# 3. Device trace at the shipped defaults (ms budget for BUILD_NOTES).
if [ ! -s $OUT/trace_lidar.log ]; then
  sleep 15
  timeout 1800 python scripts/profile_step.py --logdir /tmp/velo_prof_r5l \
    > $OUT/trace_lidar.log.part 2>&1 && mv $OUT/trace_lidar.log.part $OUT/trace_lidar.log
  echo "rc=$? trace_lidar" | tee -a $OUT/queue.log
fi
if [ ! -s $OUT/trace_fused.log ]; then
  sleep 15
  timeout 1800 python scripts/profile_step.py --vision --logdir /tmp/velo_prof_r5f \
    > $OUT/trace_fused.log.part 2>&1 && mv $OUT/trace_fused.log.part $OUT/trace_fused.log
  echo "rc=$? trace_fused" | tee -a $OUT/queue.log
fi

# 4. Driver entry + multichip dryrun at the tip.
if [ ! -s $OUT/graft.log ]; then
  sleep 15
  timeout 2400 python __graft_entry__.py > $OUT/graft.log.part 2>&1 \
    && mv $OUT/graft.log.part $OUT/graft.log
  echo "rc=$? graft_entry" | tee -a $OUT/queue.log
fi

echo "r5f queue complete $(date +%T)" | tee -a $OUT/queue.log
