"""Honest wall-clock measurement on the axon-tunnel TPU backend.

``jax.block_until_ready`` does NOT reliably block on this backend (round-3
post-mortem: 0.1 ms/frame "renders" with per-rep blocking vs 28.6 s/frame
real). A timed rep is over only when a HOST READBACK of a value derived from
the computation's output completes.

Round-5 calibration: the per-rep readback itself has a LARGE fixed floor on
the tunnel — ~26 ms for a scalar, ~55 ms when the summed leaf is ~1 MB —
measured against an in-jit ``lax.scan`` ground truth (0.28 ms/iter for the
same op that "times" at 29 ms per-rep). Every per-rep-readback number is
therefore inflated by a constant ~26-55 ms; at multi-second stage times
that is noise, at 30-100 ms stage times it is up to 3x. The honest
steady-state protocol is :func:`timeit_chained` with a PURE chain (no eager
host-side ops between reps): K dispatches whose inputs each consume the
previous rep's output (so a lazy/deduping executor can execute none of them
short), one readback at the end, floor ~1 ms/rep. Build the feedback
dependency INSIDE the jitted wrapper with :func:`feedback_scalar` — a
sum-derived value XLA cannot constant-fold away.

(Why not lax.scan around the stage? Scanning with a large carry costs
~47 ms/iter in pure carry overhead on this backend — fine for ground-truth
spot checks on small carries, wrong for state-carrying pipelines.)

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


def feedback_scalar(x) -> "jnp.ndarray":
    """A scalar derived from ``x`` (1.0 for any not-all-zero finite input)
    that XLA cannot constant-fold: thread it into the next rep's input
    inside a jitted wrapper to build a pure dispatch chain. The full-array
    sum forces the producing dispatch to complete before the consumer."""
    total = sum(jnp.sum(jnp.abs(jnp.asarray(leaf, jnp.float32)))
                for leaf in jax.tree_util.tree_leaves(x))
    return jnp.sign(jnp.minimum(total, jnp.float32(1.0)))


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
