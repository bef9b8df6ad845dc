#!/bin/bash
# Round-5g: is the obs-scaled prior still earning its default at the
# staged impl?  Same-tip staged-vs-OFF on 10 planar seeds + 5 6-DoF seeds.
# Context: on the s0-4 draw, prior-off fused (0.987) beat staged (1.478),
# and r5c's staged 6-DoF rows (mean 3.18) are worse than round-4's
# prior-off 6-DoF (2.999).  Those could all be draw chaos — this queue
# makes the comparison decision-grade.  Staged base rows for s0-4 planar,
# s0-4 6-DoF, and s5-9 planar already exist at the tip (r5d/r5e).
set -u
OUT=/tmp/r5g
mkdir -p $OUT
cd /root/repo
export VELO_FIX_ACCEL=1
LR="python scripts/longrun.py --rings 64 --azimuth 2048 --frames 150 --prebin"
OFF="s:prior_obs_gain=0.0"

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

run lidar04_off  --seeds 0,1,2,3,4 --variants $OFF
run lidar59_off  --seeds 5,6,7,8,9 --variants $OFF
run fused59_off  --vision --seeds 5,6,7,8,9 --variants $OFF
run sixdof_off   --sixdof --seeds 0,1,2,3,4 --variants $OFF
echo "r5g queue complete $(date +%T)" | tee -a $OUT/queue.log
