"""Headline benchmark: photon tracing + splat throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the BASELINE.json north-star proxy: the default interactive workload
(65 536 photons, the reference's photondata.h:145 default) traced through a
128^3 volume with up to 4 scattering events and splatted into the light
volume. Value = million photon-scatter-events per second sustained over the
full emit->trace->splat step.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def main():
    from cpm_tpu.core.camera import Camera
    from cpm_tpu.core.config import PipelineConfig, RenderConfig, TracerConfig
    from cpm_tpu.core.lights import Light
    from cpm_tpu.core.scene import Scene
    from cpm_tpu.core.types import TransferFunction, Volume
    from cpm_tpu.io import synthetic
    from cpm_tpu.pipeline import step as pstep

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    vol_dim = 128
    max_i = 4
    volume = Volume.from_data(synthetic.smoke_cloud(vol_dim, seed=3))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(volume, tf, tfs,
                         [Light.directional((0.0, -1.0, 0.3))],
                         Camera.create())
    config = PipelineConfig(
        photons_x=256, photons_y=256,
        tracer=TracerConfig(max_interactions=max_i, max_steps=6000),
        render=RenderConfig(width=512, height=512))

    state = pstep.init_state(scene, config)
    n_photons = state.photons.n

    # Warmup / compile.
    t0 = time.perf_counter()
    out = pstep.full_trace_step(scene, state, config)
    jax.block_until_ready(out.light_volume)
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pstep.full_trace_step(scene, state, config)
    jax.block_until_ready(out.light_volume)
    dt = (time.perf_counter() - t0) / reps

    mphotons_s = n_photons / dt / 1e6
    print(f"trace+splat: {dt*1e3:.1f} ms/frame, {mphotons_s:.2f} Mphotons/s",
          file=sys.stderr)

    baseline_mphotons_s = 1.0  # self-measured proxy; reference publishes none
    print(json.dumps({
        "metric": "photon_trace_splat_throughput",
        "value": round(mphotons_s, 3),
        "unit": "Mphotons/s",
        "vs_baseline": round(mphotons_s / baseline_mphotons_s, 3),
    }))


if __name__ == "__main__":
    main()
