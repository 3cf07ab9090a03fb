"""Render throughput on the real chip: dense marcher vs (optionally) loop.

Run: PYTHONPATH=/root/repo python scripts/bench_render.py
"""

import sys
import time

import jax
import numpy as np

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import RenderConfig
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import gather


def timeit(fn, reps=5):
    """fn(i) -> output; inputs must vary with i so no layer can memoize.
    Each rep is individually blocked (chained wall time, honest over the
    axon tunnel)."""
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(i + 1)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    for dim, hw in ((128, 512), (256, 512), (256, 1024)):
        volume = Volume.from_data(synthetic.smoke_cloud(dim, seed=3))
        tf = TransferFunction.from_points(*synthetic.default_tf_points())
        lvd = dim // 2
        lv = jax.random.uniform(jax.random.PRNGKey(7),
                                (lvd, lvd, lvd, 3)) * 0.3
        cam = Camera.create()
        cfg = RenderConfig(width=hw, height=hw)
        t0 = time.perf_counter()
        lvs = [lv * (1.0 + 1e-4 * i) for i in range(7)]
        dt, img = timeit(
            lambda i: gather.render(volume, tf, lvs[i], cam, cfg))
        print(f"vol={dim}^3 img={hw}^2: {dt*1e3:8.1f} ms "
              f"{hw*hw/dt/1e6:8.2f} Mrays/s  "
              f"(first call incl compile {time.perf_counter()-t0:.1f}s, "
              f"alpha_mean={np.asarray(img[...,3]).mean():.4f})")


if __name__ == "__main__":
    main()
