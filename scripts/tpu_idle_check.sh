#!/bin/bash
# Pre-handoff hygiene (VERDICT r4 Next#2c): the driver's end-of-round bench
# deadlocks if ANY process still holds the axon tunnel (one live TPU client
# at a time).  BENCH_r04 rc=2 matched exactly a builder-launched bench still
# alive at snapshot time.  Run this LAST before ending a round: rc=0 means
# the tunnel is free; rc=1 lists candidate holders (every python process
# except the axon init daemon can hold it — the sitecustomize force-
# registers the TPU backend in ANY interpreter unless explicitly disarmed).
set -u
cands=$(ps -eo pid,etime,args | awk '/python/ && !/tpu_init|awk|tpu_idle_check/')
if [ -n "$cands" ]; then
  echo "POSSIBLE TPU-HOLDING PROCESSES (kill by PID, never by pattern):"
  echo "$cands"
  exit 1
fi
echo "tunnel free: no candidate TPU clients"
