#!/bin/bash
# Round-5b diagnosis queue: the fused-planar staged-obs-prior regression.
# Sequential — ONE live TPU process at a time (axon tunnel deadlocks on a
# second client).  All lanes fused planar, 5 seeds, full scale, cached
# bit-identical fixtures (VELO_FIX_ACCEL=1, accel-tpu realizations).
#
# Lanes:
#   fused_gain0    tip, s:prior_obs_gain=0      — prior-less fallback candidate
#   fused_k2       tip, s:prior_obs_stage_iters=2 — verify the claimed 1.078
#   fused_k4_eigh  worktree @3969502, s:prior_obs_stage_iters=4 — identity
#                  check vs today's base rows (lm.py remap eig is dead code
#                  at defaults, so this MUST reproduce 1.478 if runs are
#                  deterministic; the recorded 0.886 is then a mismeasurement)
set -u
OUT=/tmp/r5b
mkdir -p $OUT
export VELO_FIX_ACCEL=1
ARGS="--rings 64 --azimuth 2048 --frames 150 --prebin --vision --seeds 0,1,2,3,4"

run() {
  local name=$1 dir=$2; shift 2
  if [ -s $OUT/$name.jsonl ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $* ($(date +%T))" | tee -a $OUT/queue.log
  (cd $dir && timeout 3600 python scripts/longrun.py $ARGS "$@" \
    > $OUT/$name.jsonl.part 2> $OUT/$name.err)
  local rc=$?
  [ $rc -eq 0 ] && [ -s $OUT/$name.jsonl.part ] && \
    mv $OUT/$name.jsonl.part $OUT/$name.jsonl
  echo "rc=$rc $name ($(date +%T))" | tee -a $OUT/queue.log
}

run fused_gain0   /root/repo   --variants s:prior_obs_gain=0
run fused_k2      /root/repo   --variants s:prior_obs_stage_iters=2
run fused_k4_eigh /tmp/wt_eigh --variants s:prior_obs_stage_iters=4
echo "r5b queue complete $(date +%T)" | tee -a $OUT/queue.log
