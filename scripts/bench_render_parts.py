"""Per-component timing of the camera ray-march to find the real bottleneck.

Variants of the render step loop with pieces knocked out, 512^2 @ 128^3.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_render_parts.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

from cpm_tpu.core import constants
from cpm_tpu.core.camera import Camera
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import intersect
from cpm_tpu.ops.sampling import (sample_volume_trilinear,
                                  sample_volume_trilinear_vec, flat_take)


def timeit(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@partial(jax.jit, static_argnames=("n_steps", "mode"))
def march(volume, tf, light_volume, o, d, n_steps, mode):
    hit, t0, t1 = intersect.ray_box(o, d)
    t0 = jnp.where(hit, t0, 0.0)
    t1 = jnp.where(hit, t1, -1.0)
    dt = (3 ** 0.5) / (n_steps - 1)
    sigma_scale = constants.SAMPLING_BASE_INTERVAL_RCP
    npix = o.shape[0]

    def step(i, carry):
        rgb, trans = carry
        t = t0 + (i + 0.5) * dt
        inside = t <= t1
        p = o + t[..., None] * d
        if mode in ("full", "novec", "notf", "volonly"):
            vol = sample_volume_trilinear(volume.data, p)
        else:
            vol = p[:, 0]
        if mode in ("full", "novec"):
            color = tf.sample(vol)
        elif mode == "notf":
            color = jnp.stack([vol, vol, vol, vol], -1)
        else:
            color = jnp.stack([vol, vol, vol, vol], -1)
        sigma_t = color[:, 3] * sigma_scale
        if mode == "full":
            light = sample_volume_trilinear_vec(light_volume, p)
        else:
            light = 0.1
        emit = color[:, :3] * (light + 0.05)
        seg_t = jnp.exp(-sigma_t * dt)
        contrib = trans[:, None] * (1.0 - seg_t)[:, None] * emit
        rgb = rgb + jnp.where(inside[:, None], contrib, 0.0)
        trans = jnp.where(inside, trans * seg_t, trans)
        return rgb, trans

    rgb0 = jnp.zeros((npix, 3), jnp.float32)
    trans0 = jnp.ones((npix,), jnp.float32)
    rgb, trans = jax.lax.fori_loop(0, n_steps, step, (rgb0, trans0))
    return jnp.concatenate([rgb, (1.0 - trans)[:, None]], axis=-1)


def main():
    print(f"backend={jax.default_backend()}")
    vol = Volume.from_data(synthetic.smoke_cloud(128, seed=3))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    lv = jnp.ones((64, 64, 64, 3), jnp.float32) * 0.1
    cam = Camera.create()
    h = w = 512
    origins, dirs = cam.rays(w, h)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    n_steps = 222

    for mode in ("volonly", "notf", "novec", "full"):
        dt = timeit(lambda: march(vol, tf, lv, o, d, n_steps, mode))
        mrays = h * w / dt / 1e6
        print(f"mode={mode:8s}: {dt*1e3:9.1f} ms  {mrays:7.3f} Mrays/s")

    # raw trilinear throughput: one dense (P,) trilinear sample outside loop
    p = jax.random.uniform(jax.random.PRNGKey(0), (h * w * 8, 3))

    @jax.jit
    def tri(vd, p):
        return sample_volume_trilinear(vd, p)

    dt = timeit(lambda: tri(vol.data, p))
    print(f"trilinear dense: {h*w*8/dt/1e9:7.3f} G samples/s "
          f"({h*w*8*8/dt/1e9:7.2f} G gathers/s)")

    @jax.jit
    def trivec(lv, p):
        return sample_volume_trilinear_vec(lv, p)

    dt = timeit(lambda: trivec(lv, p))
    print(f"trilinear_vec dense: {h*w*8/dt/1e9:7.3f} G samples/s")

    @jax.jit
    def tfs(tf, x):
        return tf.sample(x)

    x = jax.random.uniform(jax.random.PRNGKey(1), (h * w * 8,))
    dt = timeit(lambda: tfs(tf, x))
    print(f"tf.sample dense: {h*w*8/dt/1e9:7.3f} G samples/s")


if __name__ == "__main__":
    main()
