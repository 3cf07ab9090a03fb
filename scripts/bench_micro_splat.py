"""Microbenchmarks deciding the scalable-splat design (round 5).

Measures the honest (per-rep host-readback) rates of the primitives a
binned splat could be built from, at BASELINE config-5 scale (16.7M flat
photon deposits):

- lax.sort_key_val          (bin photons by cell/tile id)
- row gather                (reorder photon SoA into sorted order)
- histogram scatter-add     (1 add per photon into the LV grid)
- batch einsum per tile     (dense product splat over halo'd tiles)

Run alone (never concurrently with another JAX process on this box).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cpm_tpu.utils.benchmark import timeit

P = 1 << 24  # 16.7M
GRID = 65 * 65 * 65


def main():
    print(f"backend={jax.default_backend()} P={P}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    keys_u = jax.random.randint(key, (P,), 0, GRID, dtype=jnp.int32)
    vals_u = jnp.arange(P, dtype=jnp.int32)
    rows = jax.random.normal(key, (P, 8), jnp.float32)
    w = jax.random.uniform(key, (P,), jnp.float32)

    # 1. sort_key_val
    f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
    res = timeit(f, lambda i: (keys_u + i, vals_u), reps=3, warmup=1)
    print(f"sort_key_val {P>>20}M: {res.mean_ms:.0f} ms "
          f"({P/res.mean_s/1e6:.1f} M/s)")

    # 2. row gather (reorder SoA)
    perm = jax.random.permutation(key, P)
    f = jax.jit(lambda r, p: r[p])
    res = timeit(f, lambda i: (rows + i, perm), reps=3, warmup=1)
    print(f"row gather (P,8): {res.mean_ms:.0f} ms "
          f"({P/res.mean_s/1e6:.1f} M rows/s)")

    # 3. histogram scatter-add (1 add per photon)
    f = jax.jit(lambda k, v: jnp.zeros((GRID,), jnp.float32).at[k].add(v))
    res = timeit(f, lambda i: (keys_u + (i % 3), w), reps=3, warmup=1)
    print(f"histogram scatter 1/photon: {res.mean_ms:.0f} ms "
          f"({P/res.mean_s/1e6:.1f} M adds/s)")

    # 3b. histogram scatter-add with SORTED indices
    skeys = jax.lax.sort(keys_u)
    f = jax.jit(lambda k, v: jnp.zeros((GRID,), jnp.float32).at[k].add(
        v, indices_are_sorted=True))
    res = timeit(f, lambda i: (skeys, w + i), reps=3, warmup=1)
    print(f"histogram scatter sorted: {res.mean_ms:.0f} ms "
          f"({P/res.mean_s/1e6:.1f} M adds/s)")

    # 3c. row scatter-add: (P, 8) rows into (GRID, 8)
    f = jax.jit(lambda k, r: jnp.zeros((GRID, 8), jnp.float32).at[k].add(r))
    res = timeit(f, lambda i: (keys_u + (i % 3), rows), reps=3, warmup=1)
    print(f"row scatter (P,8)->(G,8): {res.mean_ms:.0f} ms "
          f"({P/res.mean_s/1e6:.1f} M rows/s)")

    # 4. segment-sum via sorted cumsum+gather ends
    def seg(k_sorted, v):
        c = jnp.cumsum(v)
        # end index of each segment: searchsorted over bins
        ends = jnp.searchsorted(k_sorted, jnp.arange(GRID, dtype=jnp.int32),
                                side="right")
        tot = c[jnp.maximum(ends - 1, 0)]
        return jnp.where(ends > 0, tot, 0.0)
    f = jax.jit(seg)
    res = timeit(f, lambda i: (skeys, w + i), reps=3, warmup=1)
    print(f"cumsum+searchsorted segsum: {res.mean_ms:.0f} ms")

    # 5. batch einsum: (T, K, A) x (T, K, B) -> (T, A, B), tiles 12^3 halo
    T, K, A, B = 512, 1024, 144, 48
    a = jax.random.normal(key, (T, K, A), jnp.bfloat16)
    b = jax.random.normal(key, (T, K, B), jnp.bfloat16)
    f = jax.jit(lambda a, b: jnp.einsum(
        "tka,tkb->tab", a, b, preferred_element_type=jnp.float32))
    res = timeit(f, lambda i: (a + i, b), reps=3, warmup=1)
    fl = 2 * T * K * A * B
    print(f"batch einsum {T}x{K}x{A}x{B}: {res.mean_ms:.1f} ms "
          f"({fl/res.mean_s/1e12:.1f} Tflop/s)")

    # 6. take_along_axis gather of (P,) elements (plain 1-D gather)
    f = jax.jit(lambda x, p: x[p])
    res = timeit(f, lambda i: (w + i, perm), reps=3, warmup=1)
    print(f"1-D gather P elems: {res.mean_ms:.0f} ms "
          f"({P/res.mean_s/1e6:.1f} M/s)")


if __name__ == "__main__":
    main()
