"""Gather-rate regimes, tent-matmul TF sampling, splat kernel v2."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(name, f, *args, reps=10):
    out = f(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter()-t0)/reps*1e3
    print(f"{name}: {dt:.3f} ms", file=sys.stderr)
    return dt

key = jax.random.PRNGKey(0)

# 1. flat_take regimes: (1, N) idx from (1, V) table
def flat_take(table, idx):
    out = jnp.take_along_axis(table[None, :], idx.reshape(1, -1), axis=-1)
    return out.reshape(idx.shape)

for V in [256, 65536, 2**21, 2**23]:
    table = jax.random.uniform(key, (V,))
    for N in [65536, 1048576]:
        idx = jax.random.randint(key, (N,), 0, V, dtype=jnp.int32)
        dt = timeit(f"take V={V} N={N}", jax.jit(flat_take), table, idx, reps=5)
        print(f"   -> {N/dt/1e3:.0f} M/s", file=sys.stderr)

# 2. TF sample: gather-lerp vs tent one-hot matmul
K = 256
lut = jax.random.uniform(key, (K, 4))
x = jax.random.uniform(key, (1048576,))

def tf_gather(x):
    xf = jnp.clip(x * K - 0.5, 0.0, K - 1.0)
    i0 = jnp.floor(xf).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, K - 1)
    w = (xf - i0.astype(jnp.float32))[..., None]
    flat = lut.T
    idx = jnp.stack([i0, i1])
    v = jnp.take_along_axis(flat[None, :, :], idx[:, None, :], axis=-1)
    return v[0].T * (1 - w) + v[1].T * w

def tf_tent(x):
    xf = jnp.clip(x * K - 0.5, 0.0, K - 1.0)
    ks = jnp.arange(K, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(xf[:, None] - ks[None, :]))
    return jnp.dot(w, lut, preferred_element_type=jnp.float32)

def tf_tent_bf16(x):
    xf = jnp.clip(x * K - 0.5, 0.0, K - 1.0)
    ks = jnp.arange(K, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(xf[:, None] - ks[None, :]))
    return jnp.dot(w.astype(jnp.bfloat16), lut.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)

a = jax.jit(tf_gather)(x); b = jax.jit(tf_tent)(x)
print("tent vs gather max diff:", float(jnp.max(jnp.abs(a-b))), file=sys.stderr)
timeit("tf gather-lerp 1M", jax.jit(tf_gather), x, reps=5)
timeit("tf tent-matmul 1M", jax.jit(tf_tent), x, reps=5)
timeit("tf tent-matmul bf16 1M", jax.jit(tf_tent_bf16), x, reps=5)

# 3. splat kernel v2: single dot, channel-folded B, big chunk
CHUNK, TZY, TX = 4096, 512, 128
ZY_PAD, M_PAD = 4352, 262144
pos = jax.random.uniform(key, (M_PAD, 3))
pw = jax.random.uniform(key, (M_PAD, 3))
zc = jax.random.uniform(key, (1, ZY_PAD))
yc = jax.random.uniform(key, (1, ZY_PAD))
xc = jax.random.uniform(key, (1, TX))

def epan(d):
    return jnp.maximum(0.75 * (1.0 - d*d), 0.0)

def make_v2(dt_, chunk=CHUNK, tzy=TZY):
    def kern(zc_ref, yc_ref, xc_ref, pos_ref, pow_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        inv_r = 65.0
        zt = zc_ref[:, pl.dslice(None)][:, i*tzy:(i+1)*tzy] if False else zc_ref[:]
        pz, py, px = pos_ref[:, 2:3], pos_ref[:, 1:2], pos_ref[:, 0:1]
        a = (epan((zt - pz) * inv_r) * epan((yc_ref[:] - py) * inv_r)).astype(dt_)
        bx = epan((xc_ref[:] - px) * inv_r)
        b = jnp.concatenate([bx * pow_ref[:, c:c+1] for c in range(3)],
                            axis=1).astype(dt_)
        out_ref[:] += jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    def run(zc, yc, xc, pos, pw):
        return pl.pallas_call(
            kern,
            grid=(ZY_PAD // tzy, M_PAD // chunk),
            in_specs=[
                pl.BlockSpec((1, tzy), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tzy), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TX), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tzy, 3*TX), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ZY_PAD, 3*TX), jnp.float32),
        )(zc, yc, xc, pos, pw)
    return jax.jit(run)

for name, dt_, ch, tz in [("v2-f32-4096x512", jnp.float32, 4096, 512),
                          ("v2-bf16-4096x512", jnp.bfloat16, 4096, 512),
                          ("v2-bf16-8192x1088", jnp.bfloat16, 8192, 1088),
                          ("v2-f32-2048x512", jnp.float32, 2048, 512)]:
    try:
        timeit(name, make_v2(dt_, ch, tz), zc, yc, xc, pos, pw, reps=5)
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:200]}", file=sys.stderr)
