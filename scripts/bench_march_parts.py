"""Honest per-piece timing of the dense march chunk on the real chip.

Each piece gets varied inputs per rep and per-rep blocking.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_march_parts.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

from cpm_tpu.core import constants
from cpm_tpu.core.camera import Camera
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import gather, intersect
from cpm_tpu.ops.sampling import (sample_volume_trilinear,
                                  sample_volume_trilinear_vec)


def timeit(fn, args_list, reps=3):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_list[(i + 1) % len(args_list)])
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@jax.jit
def piece_tri(vd, p):
    return jnp.sum(sample_volume_trilinear(vd, p))


@jax.jit
def piece_tri_vec(lv, p):
    return jnp.sum(sample_volume_trilinear_vec(lv, p))


@partial(jax.jit, static_argnames=())
def piece_tf(tf, x):
    return jnp.sum(tf.sample(x))


@jax.jit
def piece_cumsum(tau):
    trans = jnp.exp(-(jnp.cumsum(tau, axis=1) - tau))
    return jnp.sum(trans)


@jax.jit
def piece_positions(o, d, t0v, n_steps_arr):
    s = (n_steps_arr + 0.5) * 0.01
    t = t0v[:, None] + s[None, :]
    p = o[:, None, :] + t[..., None] * d[:, None, :]
    return jnp.sum(p)


def main():
    print(f"backend={jax.default_backend()}")
    C, S = 32768, 222
    volume = Volume.from_data(synthetic.smoke_cloud(128, seed=3))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    lv = jax.random.uniform(jax.random.PRNGKey(7), (64, 64, 64, 3)) * 0.3

    ps = [jax.random.uniform(jax.random.PRNGKey(i), (C, S, 3))
          for i in range(4)]
    xs = [jax.random.uniform(jax.random.PRNGKey(i), (C, S))
          for i in range(4)]

    n = C * S
    dt = timeit(piece_tri, [(volume.data, p) for p in ps])
    print(f"trilinear (C,S):   {dt*1e3:9.2f} ms  {n/dt/1e9:7.2f} G samp/s")

    dt = timeit(piece_tri_vec, [(lv, p) for p in ps])
    print(f"trilinear_vec:     {dt*1e3:9.2f} ms  {n/dt/1e9:7.2f} G samp/s")

    dt = timeit(piece_tf, [(tf, x) for x in xs])
    print(f"tf.sample:         {dt*1e3:9.2f} ms  {n/dt/1e9:7.2f} G samp/s")

    dt = timeit(piece_cumsum, [(x,) for x in xs])
    print(f"cumsum+exp:        {dt*1e3:9.2f} ms  {n/dt/1e9:7.2f} G samp/s")

    os_ = [jax.random.uniform(jax.random.PRNGKey(i), (C, 3))
           for i in range(4)]
    sarr = jnp.arange(S, dtype=jnp.float32)
    dt = timeit(piece_positions,
                [(o, o, o[:, 0], sarr) for o in os_])
    print(f"positions:         {dt*1e3:9.2f} ms  {n/dt/1e9:7.2f} G samp/s")

    # full chunk via the real code path
    cam = Camera.create()
    o, d = cam.rays(256, 128)  # 32768 rays
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    lvs = [lv * (1 + 1e-4 * i) for i in range(4)]

    @jax.jit
    def full(lv_):
        return gather.render_rays(volume, tf, lv_, o, d, S)

    dt = timeit(full, [(l,) for l in lvs])
    print(f"full chunk C=32768:{dt*1e3:9.2f} ms  {C/dt/1e6:7.2f} Mrays/s")


if __name__ == "__main__":
    main()
