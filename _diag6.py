"""Experiment: dynamic gather from a VMEM-resident table inside Pallas.

If this compiles + runs fast, fused trace/render kernels with the volume in
VMEM become the path to speed-of-light gathers.
"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

V = 128 * 128 * 128  # 8 MB table
N = 65536


def kern_take(table_ref, idx_ref, out_ref):
    t = table_ref[:]          # (1, V)
    idx = idx_ref[:]          # (8, N/8) int32
    flat = jnp.broadcast_to(t, (idx.shape[0], t.shape[1]))
    out_ref[:] = jnp.take_along_axis(flat, idx, axis=1)


def run_take(table, idx):
    return pl.pallas_call(
        kern_take,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.float32),
    )(table, idx)


key = jax.random.PRNGKey(0)
table = jax.random.uniform(key, (1, V))
idx = jax.random.randint(key, (8, N // 8), 0, V, dtype=jnp.int32)

def timeit(name, f, *args, reps=10):
    out = f(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.3f} ms", file=sys.stderr)
    return out

try:
    out = run_take(table, idx)
    ref = np.asarray(table)[0][np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(out), ref)
    print("pallas VMEM take_along_axis: CORRECT", file=sys.stderr)
    timeit("pallas take 65k from 8MB", jax.jit(run_take), table, idx)
except Exception as e:
    print("pallas take FAILED:", type(e).__name__, str(e)[:500], file=sys.stderr)

# same gather via plain XLA for comparison
def xla_take(table, idx):
    flat = jnp.broadcast_to(table, (idx.shape[0], table.shape[1]))
    return jnp.take_along_axis(flat, idx, axis=1)
timeit("xla take 65k from 8MB", jax.jit(xla_take), table, idx)

# bigger batch: 1M gathers (16 trace iterations' worth)
idx2 = jax.random.randint(key, (8, 131072), 0, V, dtype=jnp.int32)
try:
    timeit("pallas take 1M from 8MB", jax.jit(run_take), table, idx2)
except Exception as e:
    print("pallas take 1M FAILED:", str(e)[:300], file=sys.stderr)
timeit("xla take 1M from 8MB", jax.jit(xla_take), table, idx2)

# small table (TF LUT-like)
tiny = jax.random.uniform(key, (1, 256))
idx3 = jax.random.randint(key, (8, 131072), 0, 256, dtype=jnp.int32)
try:
    timeit("pallas take 1M from 1KB", jax.jit(run_take), tiny, idx3)
except Exception as e:
    print("pallas tiny FAILED:", str(e)[:300], file=sys.stderr)
timeit("xla take 1M from 1KB", jax.jit(xla_take), tiny, idx3)
