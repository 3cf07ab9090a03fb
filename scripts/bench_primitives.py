"""HONEST primitive microbenchmarks on the real chip.

Lesson from round 3: repeated identical dispatches get deduplicated
somewhere in the execution stack, so every rep MUST use different input
values and block individually. These numbers drive the kernel design.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_primitives.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, args_list, reps=4):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_list[(i + 1) % len(args_list)])
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@jax.jit
def xla_gather(table, idx):
    out = jnp.take_along_axis(table[None, :], idx.reshape(1, -1), axis=-1)
    return jnp.sum(out)


def _gather_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=-1)


@jax.jit
def pallas_gather(table, idx):
    # table (1, V) in VMEM; idx (R, L); gather within rows via 2D
    # take_along_axis on broadcast table rows.
    v = table.shape[0]
    r, l = idx.shape
    return pl.pallas_call(
        _gather_kernel,
        in_specs=[
            pl.BlockSpec((1, v), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, l), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, l), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, l), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(table.reshape(1, v), idx)


def _gather_bcast_kernel(tab_ref, idx_ref, out_ref):
    tab = jnp.broadcast_to(tab_ref[:], idx_ref.shape)  # (R, V) -> rows
    out_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=-1)


@jax.jit
def pallas_gather_bcast(table, idx):
    v = table.shape[0]
    r, l = idx.shape
    return pl.pallas_call(
        _gather_bcast_kernel,
        in_specs=[
            pl.BlockSpec((1, v), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, l), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, l), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, l), table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(table.reshape(1, v), idx)


@jax.jit
def mxu_batched_resample(mats_y, slabs, mats_x):
    # (K, Hi, Hv) @ (K, Hv, Wv) @ (K, Wv, Wi) on the MXU.
    tmp = jnp.einsum("kah,khw->kaw", mats_y, slabs,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("kaw,kwb->kab", tmp, mats_x,
                      preferred_element_type=jnp.float32)


@jax.jit
def hat_tf(x, pos, cols):
    # piecewise-linear TF via elementwise hat functions, P knots.
    acc = jnp.zeros(x.shape + (4,), jnp.float32)
    p = pos
    for i in range(pos.shape[0]):
        left = p[i] - p[i - 1] if i > 0 else 1.0
        right = p[i + 1] - p[i] if i < pos.shape[0] - 1 else 1.0
        w = jnp.minimum((x - (p[i] - left)) / left,
                        ((p[i] + right) - x) / right)
        w = jnp.clip(w, 0.0, 1.0)
        acc = acc + w[..., None] * cols[i]
    return acc


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    n_idx = 1 << 22  # 4M lookups

    print("--- XLA flat gather (dense top-level, varied idx per rep) ---")
    for kb in (64, 256, 1024, 8192, 65536):
        v = kb * 1024 // 4
        table = jax.random.uniform(key, (v,))
        idxs = [jax.random.randint(jax.random.PRNGKey(i), (n_idx,), 0, v,
                                   dtype=jnp.int32) for i in range(5)]
        dt = timeit(xla_gather, [(table, ix) for ix in idxs])
        print(f"  table={kb:6d}KB: {n_idx/dt/1e9:8.3f} G lookups/s"
              f"  ({dt*1e3:7.2f} ms)")

    print("--- Pallas in-VMEM gather (table rows broadcast) ---")
    for kb in (64, 256, 1024, 8192):
        v = kb * 1024 // 4
        table = jax.random.uniform(key, (v,))
        r, l = 512, n_idx // 512
        idxs = [jax.random.randint(jax.random.PRNGKey(i), (r, l), 0, v,
                                   dtype=jnp.int32) for i in range(5)]
        for name, fn in (("take1row", pallas_gather),
                         ("bcast", pallas_gather_bcast)):
            try:
                dt = timeit(fn, [(table, ix) for ix in idxs])
                print(f"  table={kb:6d}KB {name:9s}: {n_idx/dt/1e9:8.3f}"
                      f" G lookups/s  ({dt*1e3:7.2f} ms)")
            except Exception as e:
                print(f"  table={kb:6d}KB {name:9s}: FAIL "
                      f"{type(e).__name__}: {str(e).splitlines()[0][:100]}")

    print("--- MXU batched separable resample (128 slabs, 512^2 <- 128^2) ---")
    k_sl, hi, hv = 128, 512, 128
    my = [jax.random.uniform(jax.random.PRNGKey(i), (k_sl, hi, hv))
          for i in range(3)]
    sl = [jax.random.uniform(jax.random.PRNGKey(i + 9), (k_sl, hv, hv))
          for i in range(3)]
    mx = [jax.random.uniform(jax.random.PRNGKey(i + 17), (k_sl, hv, hi))
          for i in range(3)]
    dt = timeit(mxu_batched_resample,
                [(my[i], sl[i], mx[i]) for i in range(3)])
    flops = k_sl * (hi * hv * hv + hi * hv * hi) * 2
    print(f"  {dt*1e3:7.2f} ms  {flops/dt/1e12:6.2f} TFLOP/s  "
          f"({k_sl*hi*hi/dt/1e6:8.1f} M resampled px/s)")

    print("--- elementwise hat-TF (P=8 knots, 33.5M samples) ---")
    m = 1 << 25
    xs = [jax.random.uniform(jax.random.PRNGKey(i), (m,)) for i in range(3)]
    pos = jnp.linspace(0, 1, 8)
    cols = jax.random.uniform(key, (8, 4))
    dt = timeit(functools.partial(hat_tf, pos=pos, cols=cols),
                [(x,) for x in xs])
    print(f"  {dt*1e3:7.2f} ms  {m/dt/1e9:6.2f} G samples/s")

    print("--- sanity: identical-args dedup check (1MB table) ---")
    v = 1024 * 1024 // 4
    table = jax.random.uniform(key, (v,))
    ix = jax.random.randint(key, (n_idx,), 0, v, dtype=jnp.int32)
    dt_same = timeit(xla_gather, [(table, ix)])
    print(f"  same-args rate: {n_idx/dt_same/1e9:8.3f} G lookups/s "
          f"(if >> varied rate above, dedup confirmed)")


if __name__ == "__main__":
    main()
