"""Per-stage timing and throughput metrics.

The reference prints per-kernel GPU times from cl::Event elapsed-time
accumulation under IVW_DETAILED_PROFILING
(progressivephotontracercl.cpp:562-598,
photontolightvolumeprocessorcl.cpp:282-338) plus "% computed photons" log
lines. The TPU-native equivalent: explicit block_until_ready fences around
jitted stage calls, returned as a metrics dict (SURVEY.md §5) that bench.py
serializes and tests can assert on.

Async caveat: on TPU the dispatch is asynchronous and (through the remote
tunnel) ``block_until_ready`` alone can under-report; :func:`sync` forces a
one-element host readback, which is the only reliable fence observed on this
backend (~2 ms overhead, recorded once in ``dispatch_overhead_ms``).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np

__all__ = ["sync", "time_stage", "StageTimer"]


def sync(tree) -> None:
    """Fence: force completion of everything producing ``tree``."""
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def time_stage(fn: Callable, *args, reps: int = 1, **kw):
    """Run ``fn`` ``reps`` times with full fencing; returns (result, ms)."""
    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    sync(out)
    return out, (time.perf_counter() - t0) / reps * 1e3


class StageTimer:
    """Accumulates named stage timings into a metrics dict.

    >>> t = StageTimer()
    >>> photons = t("trace", tracer.trace_photons, vol, tf, ...)
    >>> lv = t("splat", splat.splat_all, photons, dim)
    >>> t.metrics  # {"trace_ms": ..., "splat_ms": ...}
    """

    def __init__(self):
        self.metrics: dict[str, float] = {}

    def __call__(self, name: str, fn: Callable, *args, **kw):
        out, ms = time_stage(fn, *args, **kw)
        self.metrics[f"{name}_ms"] = round(ms, 3)
        return out

    def rate(self, name: str, count: float, stage: str, unit: str = "M/s"):
        """Derived throughput: count / stage time."""
        ms = self.metrics[f"{stage}_ms"]
        self.metrics[f"{name}_{unit.replace('/', '_per_')}"] = round(
            count / (ms * 1e-3) / 1e6, 4)
