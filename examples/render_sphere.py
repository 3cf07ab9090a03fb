"""End-to-end demo: BASELINE config 1 — 64^3 sphere-in-box, one directional
light, 512^2 camera, 64k photons.  emit -> trace -> splat -> render.

Run:  python examples/render_sphere.py [out.npy]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import RenderConfig, TracerConfig
from cpm_tpu.core.lights import Light
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import sweep_render
from cpm_tpu.ops import emit, sampling, splat, tracer


def main(out_path="/tmp/render_sphere.npy"):
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    volume = Volume.from_data(synthetic.sphere_in_box(64))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tf_s = TransferFunction.from_points(*synthetic.default_scattering_points())
    light = Light.directional((0.0, -1.0, 0.3), radiance=(1.0, 0.95, 0.9))

    samples = sampling.stratified_grid_2d(256, 256)
    ls = emit.emit(light, samples)

    cfg = TracerConfig(max_interactions=4)
    key = jax.random.PRNGKey(7)

    t0 = time.perf_counter()
    photons = tracer.trace_photons(volume, tf, tf_s, ls, key, cfg)
    jax.block_until_ready(photons.positions)
    t1 = time.perf_counter()

    dim = splat.light_volume_dim(float(photons.radius_rel))
    lv = splat.splat_all(photons, (dim, dim, dim), method="auto")
    jax.block_until_ready(lv)
    t2 = time.perf_counter()

    cam = Camera.create(eye=(0.5, 0.7, -1.6))
    rcfg = RenderConfig(width=512, height=512)
    img = sweep_render.sweep_render(volume, tf, lv, cam, rcfg)
    jax.block_until_ready(img)
    t3 = time.perf_counter()

    n_dep = int(jnp.sum(photons.positions[..., 0] < 1e30))
    print(f"photons traced: {ls.n}  deposited interactions: {n_dep}")
    print(f"light volume: {lv.shape}, mean irradiance {float(lv.mean()):.4g}, "
          f"max {float(lv.max()):.4g}")
    print(f"image: {img.shape}, rgb mean {float(img[..., :3].mean()):.4f}, "
          f"alpha mean {float(img[..., 3].mean()):.4f}")
    print(f"timings (first call incl. compile): trace {t1-t0:.2f}s  "
          f"splat {t2-t1:.2f}s  render {t3-t2:.2f}s")

    # Steady-state timing (compiled).
    t0 = time.perf_counter()
    photons = tracer.trace_photons(volume, tf, tf_s, ls, key, cfg)
    jax.block_until_ready(photons.positions)
    t1 = time.perf_counter()
    lv = splat.splat_all(photons, (dim, dim, dim), method="auto")
    jax.block_until_ready(lv)
    t2 = time.perf_counter()
    img = sweep_render.sweep_render(volume, tf, lv, cam, rcfg)
    jax.block_until_ready(img)
    t3 = time.perf_counter()
    print(f"steady-state: trace {(t1-t0)*1e3:.1f}ms "
          f"({ls.n/(t1-t0)/1e6:.2f} Mphotons/s)  splat {(t2-t1)*1e3:.1f}ms  "
          f"render {(t3-t2)*1e3:.1f}ms "
          f"({512*512/(t3-t2)/1e6:.2f} Mrays/s)")

    np.save(out_path, np.asarray(img))
    print(f"saved {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
