#!/bin/bash
# Phase 2 of the round-4 revalidation: fused-fps recovery probes.
# Run AFTER scripts/r4_queue.sh (one live TPU process at a time).
#
# Each probe is one dual- or single-mode bench invocation; results append
# to /tmp/r4v/fps_probes.jsonl with a tag.  The drift side of fb_levels=2
# and klt_iters=6 comes from the r4_queue longruns; these are the fps side.
set -u
mkdir -p /tmp/r4v
cd /root/repo
OUT=/tmp/r4v/fps_probes.jsonl

probe() {
  local tag=$1; shift
  if grep -q "\"tag\": \"$tag\"" $OUT 2>/dev/null; then
    echo "skip $tag"; return
  fi
  echo "=== probe $tag ($(date +%T))"
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>/tmp/r4v/probe_$tag.err | tail -1)
  if [ -n "$line" ]; then
    echo "${line%\}}, \"tag\": \"$tag\"}" >> $OUT
  fi
  echo "rc=$? $tag: $line"
}

# Candidate ladder at shipped accuracy defaults unless tagged otherwise.
probe fb2            VELO_BENCH_MODE=fused VELO_BENCH_OVERRIDES="v:fb_levels=2"
probe pallas         VELO_BENCH_MODE=fused VELO_BENCH_OVERRIDES="v:klt_impl=pallas"
probe pallas_fb2     VELO_BENCH_MODE=fused VELO_BENCH_OVERRIDES="v:klt_impl=pallas+fb_levels=2"
probe disp480        VELO_BENCH_MODE=fused VELO_BENCH_FRAMES=480
probe fb2_disp480    VELO_BENCH_MODE=fused VELO_BENCH_FRAMES=480 VELO_BENCH_OVERRIDES="v:fb_levels=2"
probe klt6           VELO_BENCH_MODE=fused VELO_BENCH_OVERRIDES="v:klt_iters=6"
probe shipped_disp480_both VELO_BENCH_FRAMES=480
