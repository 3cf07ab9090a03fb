"""Binned-splat throughput at BASELINE config-5 scale (16.7M deposits)."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cpm_tpu.ops import splat_binned
from cpm_tpu.utils.benchmark import readback

P = 1 << 24
R = 0.0153866
DIM = (65, 65, 65)


def make(valid_frac: float, clustered: bool, seed: int):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    if clustered:
        pos = jnp.clip(0.5 + 0.12 * jax.random.normal(ks[0], (P, 3)),
                       0.0, 1.0)
    else:
        pos = jax.random.uniform(ks[0], (P, 3))
    pw = jax.random.uniform(ks[1], (P, 3))
    invalid = jax.random.uniform(ks[2], (P,)) > valid_frac
    pos = jnp.where(invalid[:, None], 3.4e38, pos).astype(jnp.float32)
    return pos, pw.astype(jnp.float32)


def run(name, valid_frac, clustered, k_cap=4096):
    pos, pw = make(valid_frac, clustered, 7)
    readback((pos, pw))
    t0 = time.perf_counter()
    out = splat_binned.splat_binned_flat(pos, pw, R, 1.0, DIM, k_cap=k_cap)
    readback(out)
    print(f"{name}: first (incl compile) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    times = []
    for i in range(3):
        pos2, pw2 = make(valid_frac, clustered, 10 + i)
        readback((pos2, pw2))
        t0 = time.perf_counter()
        out = splat_binned.splat_binned_flat(pos2, pw2, R, 1.0, DIM,
                                             k_cap=k_cap)
        readback(out)
        times.append(time.perf_counter() - t0)
    ms = 1e3 * min(times)
    print(f"{name}: {ms:.0f} ms  ({P * valid_frac / min(times) / 1e6:.1f} "
          f"M valid deposits/s)  times={['%.2f' % t for t in times]}")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    run("uniform 35% valid", 0.35, False)
    run("clustered 35% valid", 0.35, True)
    run("uniform 100% valid", 1.0, False)
    run("clustered 100% valid k_cap=8192", 1.0, True, k_cap=8192)
