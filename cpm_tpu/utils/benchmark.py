"""Honest wall-clock measurement on the axon-tunnel TPU backend.

``jax.block_until_ready`` does NOT reliably block on this backend (round-3
post-mortem: 0.1 ms/frame "renders" with per-rep blocking vs 28.6 s/frame
real). A timed rep is over only when a HOST READBACK of a value derived from
the computation's output completes. Two honest protocols, both provided here:

- :func:`timeit`: per rep, reduce every output leaf to a scalar ON DEVICE
  (``jnp.sum``) and ``float()`` it — only scalars cross the tunnel, so the
  readback cost is a fixed small latency, not proportional to output size.
- :func:`timeit_chained`: chain each rep's output into the next rep's input
  (data dependency forces sequential execution) and read back once at the
  end; amortizes the readback latency for sub-millisecond ops.

Both vary the inputs per rep (via ``make_args(i)``) so the executor cannot
deduplicate identical dispatches (a failure mode also observed round 3).

The reference's per-stage timing analog: IVW_DETAILED_PROFILING cl::Event
elapsed times (progressivephotontracercl.cpp:562-598).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def readback(out) -> float:
    """Force completion of ``out``'s computation: device-side scalar reduce of
    every leaf, then host transfer of the scalars only. Returns their sum."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if isinstance(x, jax.Array)]
    total = 0.0
    for leaf in leaves:
        total += float(jnp.sum(jnp.asarray(leaf, jnp.float32).ravel()[:1 << 20]))
    return total


@dataclass
class TimingResult:
    mean_s: float
    per_rep_s: list[float] = field(default_factory=list)
    checksum: float = 0.0

    @property
    def mean_ms(self) -> float:
        return self.mean_s * 1e3


def timeit(fn: Callable, make_args: Callable[[int], Sequence],
           reps: int = 5, warmup: int = 2) -> TimingResult:
    """Time ``fn(*make_args(i))`` with a per-rep scalar host readback.

    ``make_args(i)`` must return different (or at least rep-indexed) inputs
    per call; arrays it returns should already be on device.
    """
    for i in range(warmup):
        readback(fn(*make_args(-1 - i)))
    times, chk = [], 0.0
    for i in range(reps):
        args = make_args(i)
        # Make sure input prep (host->device) is not in the timed region.
        readback(args)
        t0 = time.perf_counter()
        out = fn(*args)
        chk += readback(out)
        times.append(time.perf_counter() - t0)
    return TimingResult(mean_s=float(np.mean(times)), per_rep_s=times,
                        checksum=chk)


def timeit_chained(fn: Callable, init_args: Sequence, chain: Callable,
                   reps: int = 20, warmup: int = 2) -> TimingResult:
    """Time ``fn`` by chaining reps: ``args = chain(args, out, i)`` threads a
    data dependency from each rep's output into the next rep's input, and one
    readback at the end covers the whole chain. Suited to ops too fast for
    per-rep readback latency.
    """
    args = tuple(init_args)
    for i in range(warmup):
        out = fn(*args)
        args = tuple(chain(args, out, i))
    readback(args)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args)
        args = tuple(chain(args, out, i))
    chk = readback(out)
    dt = time.perf_counter() - t0
    return TimingResult(mean_s=dt / reps, per_rep_s=[dt / reps],
                        checksum=chk)


class StageTimer:
    """Accumulates named stage timings (honest readback per stage call).

    Usage::

        st = StageTimer()
        out = st.run("trace", lambda: trace(...))
        st.report()  -> {"trace": {"ms": ..., "calls": ...}, ...}
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.calls: dict[str, int] = {}

    def run(self, name: str, thunk: Callable):
        t0 = time.perf_counter()
        out = thunk()
        readback(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.calls[name] = self.calls.get(name, 0) + 1
        return out

    def report(self) -> dict:
        return {k: {"ms": round(self.totals[k] * 1e3 / max(self.calls[k], 1), 3),
                    "calls": self.calls[k]}
                for k in self.totals}
