"""Tracing / profiling utilities (SURVEY.md §5).

The reference's observability is ad-hoc stdout timers; here:

  * ``stage_timer`` — host-side wall-clock per pipeline stage with
    ``block_until_ready`` fencing (honest device timing);
  * ``trace`` — context manager around ``jax.profiler.trace`` producing a
    TensorBoard-loadable device profile;
  * ``FrameLog`` — accumulates the per-frame structured records the scan
    carry already produces (pose, correspondence counts, solve cost,
    degeneracy flags) and dumps them to ``.npz`` for offline analysis.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax
import numpy as np


class StageTimer:
    """Accumulating per-stage wall-clock timer (device-fenced)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, *fence):
        t0 = time.perf_counter()
        yield
        for x in fence:
            jax.block_until_ready(x)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = max(self.counts[name], 1)
            lines.append(
                f"{name:24s} {self.totals[name]*1e3:9.2f} ms total  "
                f"{self.totals[name]/n*1e3:8.3f} ms/call  x{n}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Device profile -> TensorBoard (tensorboard-plugin-profile)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameLog:
    """Structured per-frame records -> single .npz artifact."""

    def __init__(self):
        self._rows: Dict[str, List] = defaultdict(list)

    def add(self, **fields):
        for k, v in fields.items():
            self._rows[k].append(np.asarray(v))

    def save(self, path: str):
        np.savez_compressed(
            path, **{k: np.stack(v) for k, v in self._rows.items()}
        )

    def as_dict(self):
        return {k: np.stack(v) for k, v in self._rows.items()}
