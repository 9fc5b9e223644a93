"""Trace-time analytic FLOP registry for Pallas kernels.

XLA's ``compiled.cost_analysis()`` reports 0 FLOPs for custom calls, so a
step dominated by fused Pallas kernels looks nearly free to it — BENCH_r02's
0.76% "MFU" was this artifact, not a slow chip. Each Pallas wrapper calls
:func:`record` with an analytic count of its MXU-matmul FLOPs (the dominant
term; elementwise VPU work is deliberately excluded, so totals are a mild
lower bound). Recording happens at Python trace time, which runs exactly
once per lowering — so wrapping ``jit(...).lower(...)`` in :func:`collect`
yields the per-compilation kernel FLOPs:

    with flops.collect() as fl:
        lowered = step.lower(...)
    total = fl.total()          # analytic Pallas FLOPs of ONE step

Disabled (zero overhead beyond one ``if``) unless a collector is active.
Not thread-safe across concurrent lowerings — bench/profiling is
single-threaded here.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Iterator, List, Tuple


class _Collector:
    def __init__(self) -> None:
        self.entries: List[Tuple[str, float]] = []

    def total(self) -> float:
        return float(sum(f for _, f in self.entries))

    def by_kernel(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, f in self.entries:
            out[name] = out.get(name, 0.0) + f
        return out


_active: List[_Collector] = []


def record(name: str, flops: float) -> None:
    """Called by kernel wrappers at trace time; no-op unless collecting."""
    if _active:
        _active[-1].entries.append((name, float(flops)))


@contextlib.contextmanager
def collect() -> Iterator[_Collector]:
    c = _Collector()
    _active.append(c)
    try:
        yield c
    finally:
        _active.pop()


def matmul_flops(m: int, n: int, k: int) -> float:
    """2*m*n*k — the canonical dense-matmul FLOP count."""
    return 2.0 * m * n * k
