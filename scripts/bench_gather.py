"""Microbenchmark: gather (table lookup) throughput on the real TPU chip.

Decides the render/tracer kernel design: at what table size does the XLA
lane-gather fast path fall off, and can a Pallas kernel with the table pinned
in VMEM hold the fast rate for volume-sized (8-64 MB) tables?

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_gather.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@jax.jit
def xla_gather(table, idx):
    out = jnp.take_along_axis(table[None, :], idx.reshape(1, -1), axis=-1)
    return out.reshape(idx.shape)


def _gather_kernel(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]  # (1, V)
    ii = idx_ref[:]   # (R, L)
    r, l = ii.shape
    out_ref[:] = jnp.take_along_axis(
        tab, ii.reshape(1, r * l), axis=-1).reshape(r, l)


@functools.partial(jax.jit, static_argnames=("rows_per_step",))
def pallas_gather(table, idx, rows_per_step=8):
    v = table.shape[0]
    m, l = idx.shape
    grid = (m // rows_per_step,)
    return pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_step, l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, l), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(table.reshape(1, v), idx)


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    key = jax.random.PRNGKey(0)
    n_idx = 2 ** 21  # 2M lookups
    idx_flat = jax.random.randint(key, (n_idx,), 0, 2 ** 18, dtype=jnp.int32)

    for mb in (1, 2, 4, 8, 16, 32, 64):
        v = mb * 1024 * 1024 // 4
        table = jnp.arange(v, dtype=jnp.float32)
        idx = (idx_flat % v).astype(jnp.int32)
        dt = timeit(xla_gather, table, idx)
        print(f"XLA   flat_take  table={mb:3d}MB f32: "
              f"{n_idx / dt / 1e9:8.3f} G lookups/s")

    idx2 = (idx_flat % (2 ** 18)).reshape(-1, 1024).astype(jnp.int32)
    for mb in (1, 2, 4, 8, 16, 32, 64, 96):
        v = mb * 1024 * 1024 // 4
        table = jnp.arange(v, dtype=jnp.float32)
        idxv = (idx_flat % v).reshape(-1, 1024).astype(jnp.int32)
        for rows in (8, 32, 128):
            try:
                dt = timeit(pallas_gather, table, idxv, rows)
                print(f"PALLAS gather    table={mb:3d}MB f32 rows={rows:4d}: "
                      f"{n_idx / dt / 1e9:8.3f} G lookups/s")
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f"PALLAS gather    table={mb:3d}MB f32 rows={rows:4d}: "
                      f"FAIL {type(e).__name__}: {msg}")
                break


if __name__ == "__main__":
    main()
