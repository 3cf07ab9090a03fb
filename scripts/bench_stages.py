"""Per-stage breakdown of the correlated interactive frame + tracer
knockout profile, with the honest readback protocol
(cpm_tpu/utils/benchmark.py — block_until_ready is not a fence here).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_stages.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import PipelineConfig, RenderConfig, TracerConfig
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import path_importance, select, splat, tracer
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.utils.benchmark import readback, timeit


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    volume = Volume.from_data(synthetic.smoke_cloud(128, seed=3))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(volume, tf, tfs,
                         [Light.directional((0.0, -1.0, 0.3))],
                         Camera.create())
    config = PipelineConfig(
        photons_x=256, photons_y=256,
        tracer=TracerConfig(max_interactions=4, max_steps=6000),
        render=RenderConfig(width=512, height=512))
    state = pstep.full_trace_step(scene, pstep.init_state(scene, config),
                                  config)
    readback(state.light_volume)
    n = state.photons.n
    imp_grid = pstep.build_importance_grid(scene, config)
    budget = pstep.recompute_budget(config, n)

    # --- correlated-step stage knockouts ---
    def t(name, fn, make_args, reps=4):
        r = timeit(fn, make_args, reps=reps, warmup=1)
        print(f"{name:>28}: {r.mean_ms:8.1f} ms")
        return r.mean_s

    keys = [jax.random.fold_in(state.key, i) for i in range(4)]
    ph_var = [state.photons.replace(powers=state.photons.powers * (1 + i * .01))
              for i in range(4)]

    t("path_importance", lambda p: path_importance.photon_path_importance(
        imp_grid, p, state.light_samples,
        max_steps=config.recompute.importance_steps),
      lambda i: (ph_var[i % 4],))

    imp = path_importance.photon_path_importance(
        imp_grid, state.photons, state.light_samples,
        max_steps=config.recompute.importance_steps)
    imps = [imp * (1 + 0.01 * i) for i in range(4)]
    t("select(top_k)", lambda x: select.select_photons_to_recompute(
        x, budget, exclude=state.retraced), lambda i: (imps[i % 4],))

    idx, valid, _ = select.select_photons_to_recompute(
        imp, budget, exclude=state.retraced)
    sub = tracer.LightSamples(
        origins=state.light_samples.origins[idx],
        directions=state.light_samples.directions[idx],
        powers=state.light_samples.powers[idx],
        tspan=state.light_samples.tspan[idx],
        iteration=state.light_samples.iteration)
    t("retrace(budget lanes)", lambda k: tracer.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, sub, k, config.tracer,
        lane_ids=idx).positions, lambda i: (keys[i % 4],))

    dim = pstep.light_volume_shape(config)
    fp = pstep.splat_footprint(config)
    method = pstep.splat_method(config)
    t("splat_selected x1", lambda p: splat.splat_selected(
        p, idx, valid, dim, fp, method=method), lambda i: (ph_var[i % 4],))

    t("correlated_step(total)", lambda s: pstep.correlated_step(
        scene, s, config, imp_grid, budget).light_volume,
      lambda i: (state.replace(key=keys[i % 4]),))

    # --- tracer knockout: compaction on/off, majorant cell size ---
    for label, cfg in [
        ("trace base", config.tracer),
        ("trace no-compaction",
         TracerConfig(max_interactions=4, max_steps=6000,
                      use_compaction=False)),
        ("trace cell=4",
         TracerConfig(max_interactions=4, max_steps=6000,
                      majorant_cell_size=4, brick_scale=2)),
        ("trace cell=16",
         TracerConfig(max_interactions=4, max_steps=6000,
                      majorant_cell_size=16, brick_scale=2)),
        ("trace f16 photons",
         TracerConfig(max_interactions=4, max_steps=6000,
                      photon_dtype="float16")),
    ]:
        t(label, lambda k, c=cfg: tracer.trace_photons(
            scene.volume, scene.tf, scene.tf_scattering,
            state.light_samples, k, c).positions,
          lambda i: (keys[i % 4],), reps=3)


if __name__ == "__main__":
    main()
