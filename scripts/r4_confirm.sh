#!/bin/bash
# Round-4 confirmation queue: validate the COMBINED new defaults
# (fb_levels=2 + prior_obs_gain=4.0, flipped on the r4s single-knob A/Bs)
# before they become the round's shipped story.  Sequential — ONE live TPU
# process at a time.  Resumable: non-empty output JSONL skips the run.
set -u
OUT=/tmp/r4n
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

# Headline first: dual-mode bench at the new shipped defaults.
if [ ! -s $OUT/bench.json ]; then
  echo "=== bench ($(date +%T))" | tee -a $OUT/queue.log
  timeout 2400 python bench.py > $OUT/bench.json.part 2> $OUT/bench.err
  rc=$?
  [ $rc -eq 0 ] && mv $OUT/bench.json.part $OUT/bench.json
  echo "rc=$rc bench ($(date +%T))" | tee -a $OUT/queue.log
fi

# Combined-default drift confirmation (fb2 x obs4 interaction).
run fused_planar_new   --vision --seeds 0,1,2,3,4
run fused_6dof_new     --vision --sixdof --seeds 0,1,2,3,4
run fused_suburban_new --vision --world suburban --seeds 0,1,2
run fused_noise_new    --vision --noise 0.02 --seeds 0,1,2,3,4
run fused_heldout_new  --vision --seeds 5,6,7,8,9
echo "r4n queue complete $(date +%T)" | tee -a $OUT/queue.log
