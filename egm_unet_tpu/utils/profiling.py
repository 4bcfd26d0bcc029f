"""Tracing/profiling utilities (SURVEY.md §5.1).

The reference only has wall-clock timers (``time_synchronized`` with
cuda.synchronize, ref: predict.py:13-15; MetricLogger iter/data timers).
TPU equivalents here:

- ``device_synchronized()``: wall clock after draining the device stream
  (``block_until_ready`` on a trivial computation).  NOTE: on tunneled
  backends block_until_ready can return early — for kernel timing use
  ``chained_time`` (the bench.py two-point methodology).
- ``StepTimer``: per-phase accumulator (data/compute/total) with FPS.
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory, the real way to see MXU utilization per op.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp


def device_synchronized() -> float:
    jnp.zeros(()).block_until_ready()
    return time.perf_counter()


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates named phase durations; prints an FPS-style summary
    (ref: predict.py:92-93 FPS = 1/(total/count))."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._start = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def fps(self, name: str = "step") -> float:
        if self.counts[name] == 0:
            return 0.0
        return self.counts[name] / self.totals[name]

    def summary(self) -> str:
        return "  ".join(
            f"{k}: {self.totals[k] / max(self.counts[k], 1) * 1e3:.2f}ms"
            for k in sorted(self.totals))
