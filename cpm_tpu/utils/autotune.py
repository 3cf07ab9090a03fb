"""Measure-and-cache autotuner — the clogs-autotuner role, TPU-style.

The reference vendors clogs, which benchmarks radix-sort/scan workgroup
sizes on first use and persists winners in a sqlite cache
(modules/radixsortcl/ext/clogs/; README.md:34 "Be patient: Optimal OpenCL
workgroup sizes are found ... the first time loading the workspace").
XLA makes most of that moot (SURVEY §5), but the host-orchestrated paths
keep a few genuinely data/shape-dependent knobs — the binned splat's
block capacity and chunk width chief among them. This module measures the
candidates ONCE per (key, device kind) with the honest chained protocol
and persists winners in a JSON cache next to the user's config.

Usage::

    best = autotune("binned_splat_16M",
                    {"k2048": lambda: run(2048), "k4096": lambda: run(4096)})
    # -> label of the fastest candidate; cached on disk for next time
"""

from __future__ import annotations

import json
import os
import time

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/cpm_tpu/autotune.json")


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:  # pragma: no cover - no backend at all
        return "unknown"


def _load(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _store(path: str, cache: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def measure(thunk, reps: int = 3, warmup: int = 1) -> float:
    """Best-of-reps wall seconds for ``thunk()`` with full completion
    (readback of the result) per rep."""
    from cpm_tpu.utils.benchmark import readback

    for _ in range(warmup):
        readback(thunk())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(thunk())
        best = min(best, time.perf_counter() - t0)
    return best


def autotune(key: str, candidates: dict, cache_path: str | None = None,
             reps: int = 3, force: bool = False) -> str:
    """Return the label of the fastest candidate thunk, measuring once per
    (key, device kind) and caching the winner (with its timings) on disk.
    """
    path = cache_path or _DEFAULT_CACHE
    cache = _load(path)
    entry_key = f"{key}@{_device_kind()}"
    hit = cache.get(entry_key)
    if hit is not None and not force and hit.get("best") in candidates:
        return hit["best"]

    timings = {}
    for label, thunk in candidates.items():
        timings[label] = measure(thunk, reps=reps)
    best = min(timings, key=timings.get)
    cache[entry_key] = {
        "best": best,
        "timings_ms": {k: round(v * 1e3, 3) for k, v in timings.items()},
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    _store(path, cache)
    return best


def tune_binned_splat(n_deposits: int, out_dim: tuple,
                      radius_rel: float = 0.0153866,
                      cache_path: str | None = None) -> dict:
    """Pick (k_cap, a_chunk) for :func:`cpm_tpu.ops.splat_binned.
    splat_binned_flat` at the given scale: measures a clustered synthetic
    deposit set (the skew-heavy case) across candidate block shapes, once
    per device kind. Returns {"k_cap": ..., "a_chunk": ...}."""
    import jax.numpy as jnp

    from cpm_tpu.ops import splat_binned

    keyname = f"binned_splat_n{n_deposits}_d{out_dim[0]}"
    k = jax.random.PRNGKey(0)
    pos = jnp.clip(0.5 + 0.15 * jax.random.normal(k, (n_deposits, 3)),
                   0.0, 1.0).astype(jnp.float32)
    pw = jax.random.uniform(jax.random.fold_in(k, 1), (n_deposits, 3))

    def run(k_cap, a_chunk):
        return lambda: splat_binned.splat_binned_flat(
            pos, pw, radius_rel, 1.0, out_dim, k_cap=k_cap, a_chunk=a_chunk)

    grid = {f"k{kc}_a{ac}": run(kc, ac)
            for kc in (2048, 4096, 8192)
            for ac in (32, 64, 128)}
    best = autotune(keyname, grid, cache_path=cache_path)
    kc, ac = best[1:].split("_a")
    return {"k_cap": int(kc), "a_chunk": int(ac)}
