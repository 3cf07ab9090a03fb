"""Ground-truth microbench: gather formulations + dense table-eval tricks.

Run on the real chip. All timings use the honest per-rep scalar-readback
protocol (cpm_tpu.utils.benchmark) — never block_until_ready.
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cpm_tpu.utils.benchmark import timeit  # noqa: E402


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    key = jax.random.PRNGKey(0)

    M = 1 << 21          # table entries (~128^3)
    N = 1 << 22          # lookups
    table = jax.random.uniform(key, (M,))
    idx_base = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, M,
                                  dtype=jnp.int32)

    @jax.jit
    def f_take_along(table, idx):
        out = jnp.take_along_axis(table[None, :], idx.reshape(1, -1), axis=-1)
        return jnp.sum(out)

    @jax.jit
    def f_plain_take(table, idx):
        return jnp.sum(table[idx])

    def make_args(i):
        return table, (idx_base + i) % M

    for name, fn in [("take_along_minor", f_take_along),
                     ("plain_take", f_plain_take)]:
        r = timeit(fn, make_args, reps=3, warmup=1)
        print(f"{name:24s} {r.mean_ms:9.2f} ms  "
              f"{N / r.mean_s / 1e9:7.3f} G lookups/s")

    # Small-table (TF LUT, K=256) formulations, N samples
    K = 256
    lut = jax.random.uniform(jax.random.PRNGKey(2), (K, 4))
    x_base = jax.random.uniform(jax.random.PRNGKey(3), (N,))

    @jax.jit
    def f_lut_gather(lut, x):
        xf = jnp.clip(x * K - 0.5, 0.0, K - 1.0)
        i0 = jnp.floor(xf).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, K - 1)
        w = xf - i0.astype(jnp.float32)
        acc = 0.0
        for c in range(4):
            tab = lut[:, c][None, :]
            v0 = jnp.take_along_axis(tab, i0[None, :], axis=-1)[0]
            v1 = jnp.take_along_axis(tab, i1[None, :], axis=-1)[0]
            acc += jnp.sum(v0 * (1 - w) + v1 * w)
        return acc

    @jax.jit
    def f_lut_tent(lut, x):
        # dense: out[n, c] = sum_k tent(u_n - k) lut[k, c], fused reduce
        u = jnp.clip(x * K - 0.5, 0.0, K - 1.0)
        ks = jnp.arange(K, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - ks[None, :]))  # (N,K)
        return jnp.sum(jnp.dot(w, lut))

    @jax.jit
    def f_piecewise(positions, colors, x):
        # direct point-list piecewise-linear eval, P points
        p = positions
        c = colors
        P = p.shape[0]
        acc = jnp.zeros(x.shape + (4,))
        for s in range(P - 1):
            t = (x - p[s]) / jnp.maximum(p[s + 1] - p[s], 1e-8)
            seg = c[s][None, :] * (1 - t[:, None]) + c[s + 1][None, :] * t[:, None]
            inside = ((x >= p[s]) & (x < p[s + 1]))[:, None]
            acc = jnp.where(inside, seg, acc)
        acc = jnp.where((x >= p[-1])[:, None], c[-1][None], acc)
        acc = jnp.where((x < p[0])[:, None], c[0][None], acc)
        return jnp.sum(acc)

    P = 8
    positions = jnp.sort(jax.random.uniform(jax.random.PRNGKey(4), (P,)))
    colors = jax.random.uniform(jax.random.PRNGKey(5), (P, 4))

    r = timeit(f_lut_gather, lambda i: (lut, (x_base + i * 0.001) % 1.0),
               reps=3, warmup=1)
    print(f"{'lut_gather(K=256)':24s} {r.mean_ms:9.2f} ms  "
          f"{N / r.mean_s / 1e6:8.1f} M samples/s")
    r = timeit(f_lut_tent, lambda i: (lut, (x_base + i * 0.001) % 1.0),
               reps=3, warmup=1)
    print(f"{'lut_tent_mxu(K=256)':24s} {r.mean_ms:9.2f} ms  "
          f"{N / r.mean_s / 1e6:8.1f} M samples/s")
    r = timeit(f_piecewise,
               lambda i: (positions, colors, (x_base + i * 0.001) % 1.0),
               reps=3, warmup=1)
    print(f"{'piecewise_direct(P=8)':24s} {r.mean_ms:9.2f} ms  "
          f"{N / r.mean_s / 1e6:8.1f} M samples/s")

    # 1D resample contraction: out[n] = sum_k tent(u_n - k) v[k], K=128
    # (the shear-renderer inner op), VPU fused form at volume scale
    K2 = 128
    v = jax.random.uniform(jax.random.PRNGKey(6), (K2,))

    @jax.jit
    def f_resample(v, u):
        ks = jnp.arange(K2, dtype=jnp.float32)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - ks[None, :]))
        return jnp.sum(w @ v)

    r = timeit(f_resample,
               lambda i: (v, (x_base + i * 0.001) % 1.0 * K2), reps=3, warmup=1)
    print(f"{'tent_resample(K=128)':24s} {r.mean_ms:9.2f} ms  "
          f"{N / r.mean_s / 1e6:8.1f} M samples/s")


if __name__ == "__main__":
    main()
