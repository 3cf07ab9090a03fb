"""Ablate the Pallas splat: bf16 vs f32, output layout, A-gen vs matmul."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK, TZY, TX = 1024, 512, 128
ZY_PAD, M_PAD = 4352, 262144

def timeit(name, f, *args, reps=5):
    out = f(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", file=sys.stderr)
    return out

key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key, (M_PAD, 3))
pw = jax.random.uniform(key, (M_PAD, 3))
zc = jax.random.uniform(key, (1, ZY_PAD))
yc = jax.random.uniform(key, (1, ZY_PAD))
xc = jax.random.uniform(key, (1, TX))

def epan(d):
    return jnp.maximum(0.75 * (1.0 - d*d), 0.0)

def make(variant):
    def kern(zc_ref, yc_ref, xc_ref, pos_ref, pow_ref, out_ref):
        j = pl.program_id(1)
        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        inv_r = 65.0
        pz, py, px = pos_ref[:, 2:3], pos_ref[:, 1:2], pos_ref[:, 0:1]
        if variant == "no_agen":
            a = jnp.ones((CHUNK, TZY), jnp.float32)
            bx = jnp.ones((CHUNK, TX), jnp.float32)
        else:
            a = epan((zc_ref[:] - pz) * inv_r) * epan((yc_ref[:] - py) * inv_r)
            bx = epan((xc_ref[:] - px) * inv_r)
        if variant == "bf16":
            a = a.astype(jnp.bfloat16); bx = bx.astype(jnp.bfloat16)
        if variant == "no_mxu":
            out_ref[:, 0, :] += jnp.sum(a, axis=0, keepdims=True) + jnp.sum(bx, axis=0, keepdims=True)
            return
        for c in range(3):
            bc = bx * pow_ref[:, c:c+1].astype(a.dtype)
            out_ref[:, c, :] += jax.lax.dot_general(
                a, bc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    def run(zc, yc, xc, pos, pw):
        return pl.pallas_call(
            kern,
            grid=(ZY_PAD // TZY, M_PAD // CHUNK),
            in_specs=[
                pl.BlockSpec((1, TZY), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TZY), lambda i, j: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TX), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, 3), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TZY, 3, TX), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ZY_PAD, 3, TX), jnp.float32),
        )(zc, yc, xc, pos, pw)
    return jax.jit(run)

for v in ["base", "bf16", "no_agen", "no_mxu"]:
    try:
        timeit(f"splat-{v}", make(v), zc, yc, xc, pos, pw)
    except Exception as e:
        print(f"splat-{v} FAILED: {str(e)[:300]}", file=sys.stderr)
