"""Profiling and throughput observability.

The reference's instrumentation is a hand-rolled tic/toc Timer used once
(model/KPConv_blocks.py:34-64) plus per-epoch wall time logs. Here:

- StepTimer: per-step wall times with warmup skip -> clouds/sec/chip, the
  BASELINE.md headline metric, logged per epoch by the training loops.
- trace(): context manager around jax.profiler for on-demand XLA traces
  (set SUG_PROFILE=<dir> to capture one epoch's trace).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional


class StepTimer:
    """Accumulates step wall times; first ``warmup`` steps (compile) are
    excluded from the throughput estimate."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.reset()

    def reset(self):
        self._count = 0
        self._total = 0.0
        self._clouds = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, clouds: int = 0):
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._count += 1
        if self._count > self.warmup:
            self._total += dt
            self._clouds += clouds

    @property
    def steps_timed(self) -> int:
        return max(self._count - self.warmup, 0)

    def clouds_per_sec(self, n_chips: int = 1) -> float:
        if self._total <= 0:
            return 0.0
        return self._clouds / self._total / max(n_chips, 1)

    def ms_per_step(self) -> float:
        n = self.steps_timed
        return self._total / n * 1000.0 if n else 0.0


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace when a directory is given (or via the
    SUG_PROFILE env var); no-op otherwise."""
    log_dir = log_dir or os.environ.get("SUG_PROFILE")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
