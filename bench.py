"""Headline benchmark: per-stage photon-mapping throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus a
"metrics" dict of keyed per-stage numbers and a "stages" per-stage ms
breakdown — the analog of the reference's IVW_DETAILED_PROFILING cl::Event
stage prints (progressivephotontracercl.cpp:562-598).

All timings use the honest protocol in cpm_tpu/utils/benchmark.py. Round-5
calibration found the per-rep scalar readback itself costs ~26-55 ms of
fixed tunnel latency (the r1-r4 numbers include it), so the default-config
stages now use the PURE dispatch chain: K dispatches whose inputs each
consume the previous output (built inside jit via feedback_scalar, so a
lazy or deduplicating executor cannot skip any rep), one readback at the
end (~1 ms/rep floor, validated against an in-jit lax.scan ground truth).
The --large stages keep per-rep readbacks (stage times >> floor there).

Default config = the reference's interactive workload: 65 536 photons
(photondata.h:145), 128^3 volume, up to 4 scattering events, 512^2 camera.
``--large`` runs the BASELINE config-5 scale proof: 4M photons / 256^3.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(vol_dim: int, photons_xy: tuple[int, int], max_i: int,
          width: int = 512, n_lights: int = 1):
    from cpm_tpu.core.camera import Camera
    from cpm_tpu.core.config import (PipelineConfig, RecomputeConfig,
                                     RenderConfig, TracerConfig)
    from cpm_tpu.core.lights import Light
    from cpm_tpu.core.scene import Scene
    from cpm_tpu.core.types import TransferFunction, Volume
    from cpm_tpu.io import synthetic

    volume = Volume.from_data(synthetic.smoke_cloud(vol_dim, seed=3))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    lights = [Light.directional((0.0, -1.0, 0.3)),
              Light.directional((0.8, -0.4, -0.2))][:n_lights]
    scene = Scene.create(volume, tf, tfs, lights, Camera.create())
    # Multi-million-photon configs halve the importance quadrature: at 4M
    # photons the (serial-gather) integration is the dominant correlated
    # cost (~1.4 s at K=8), and the 4-sample midpoint rule ranks the same
    # top-10% set in practice.
    k_quad = 4 if photons_xy[0] * photons_xy[1] * max(n_lights, 1) > (
        1 << 20) else 8
    config = PipelineConfig(
        photons_x=photons_xy[0], photons_y=photons_xy[1],
        tracer=TracerConfig(max_interactions=max_i, max_steps=6000),
        recompute=RecomputeConfig(max_photons_fraction=0.1,
                                  importance_quadrature_samples=k_quad),
        render=RenderConfig(width=width, height=width))
    return scene, config


def run_large(scene, config, reps: int):
    """BASELINE config-5 scale proof: 4M photons / 256^3 / 1024^2 on one
    chip, stage-by-stage OUTSIDE the fused step jits (the monolithic 4M
    program OOMs and compiles for >10 min; the chunked trace compiles one
    512k-lane program and reuses it — bit-identical results, lane-id RNG)."""
    import time as _time

    from cpm_tpu.core.camera import Camera
    from cpm_tpu.ops import splat_binned
    from cpm_tpu.ops import sweep_render
    from cpm_tpu.ops import tracer as tracer_mod
    from cpm_tpu.pipeline import step as pstep
    from cpm_tpu.utils.benchmark import readback, timeit

    print("large: scene built", file=sys.stderr, flush=True)
    state = pstep.init_state(scene, config)
    from cpm_tpu.utils.benchmark import readback as _rb
    _rb(state.light_samples.tspan)
    print("large: state initialized", file=sys.stderr, flush=True)
    n = state.photons.n
    chunk = 1 << 19  # 512k lanes per wavefront launch
    stages: dict[str, dict] = {}
    metrics: dict[str, float] = {}

    def trace(key):
        return tracer_mod.trace_photons_chunked(
            scene.volume, scene.tf, scene.tf_scattering,
            state.light_samples, key, config.tracer, chunk)

    t0 = _time.perf_counter()
    photons = trace(jax.random.fold_in(state.key, 0))
    readback(photons.positions)
    print(f"large trace compile+first: {_time.perf_counter() - t0:.1f}s "
          f"({n} photons, chunk {chunk})", file=sys.stderr)
    keys = [jax.random.fold_in(state.key, 100 + i) for i in range(2)]
    res = timeit(lambda k: trace(k).positions, lambda i: (keys[i % 2],),
                 reps=reps, warmup=0)
    stages["trace"] = {"ms": round(res.mean_ms, 1)}
    metrics["trace_mphotons_s"] = round(n / res.mean_s / 1e6, 3)

    # --- splat 4M x I deposits (binned sort->tile->MXU backend; the exact
    #     scatter costs 28.1 s here and is kept as the small-scale oracle) ---
    photons = photons.replace(
        radius_rel=jnp.float32(config.tracer.radius_rel),
        scene_radius=scene.volume.scene_radius())
    dim = pstep.light_volume_shape(config)
    fp = pstep.splat_footprint(config)
    t0 = _time.perf_counter()
    lv = splat_binned.splat_all_binned(photons, dim, fp)
    readback(lv)
    print(f"large splat compile+first: {_time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    variants = [photons.replace(powers=photons.powers * (1.0 + 0.01 * i))
                for i in range(2)]
    res = timeit(
        lambda p: splat_binned.splat_all_binned(p, dim, fp),
        lambda i: (variants[i % 2],), reps=reps, warmup=0)
    stages["splat"] = {"ms": round(res.mean_ms, 1)}
    metrics["splat_ms"] = round(res.mean_ms, 1)

    # --- render 1024^2 over 256^3 ---
    w = config.render.width
    cams = [Camera.create(eye=(0.4 + 0.01 * i, 0.6, -1.4)) for i in range(4)]
    res = timeit(lambda c: sweep_render.sweep_render(
        scene.volume, scene.tf, lv, c, config.render),
        lambda i: (cams[i % 4],), reps=max(reps, 3), warmup=1)
    stages["render"] = {"ms": round(res.mean_ms, 1)}
    metrics["render_mrays_s"] = round(w * w / res.mean_s / 1e6, 3)
    metrics["render_ms"] = round(res.mean_ms, 1)

    # --- correlated selective recompute at 4M (top_k selection, binned
    #     incremental splats via the host-orchestrated scalable step) ---
    big_state = state.replace(photons=photons, light_volume=lv,
                              light_volume_accum=lv)
    imp = pstep.build_importance_grid(scene, config)
    budget = pstep.recompute_budget(config, n)
    t0 = _time.perf_counter()
    out = pstep.correlated_step_scalable(scene, big_state, config, imp,
                                         budget)
    readback(out.light_volume)
    print(f"large correlated compile+first: {_time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    res = timeit(
        lambda s: pstep.correlated_step_scalable(scene, s, config, imp,
                                                 budget).light_volume,
        lambda i: (big_state.replace(
            key=jax.random.fold_in(big_state.key, 50 + i)),),
        reps=reps, warmup=0)
    stages["correlated"] = {"ms": round(res.mean_ms, 1)}
    metrics["correlated_ms"] = round(res.mean_ms, 1)

    headline = metrics["trace_mphotons_s"]
    for name, v in stages.items():
        print(f"  {name:>12}: {v}", file=sys.stderr)
    print(json.dumps({
        "metric": "photon_trace_throughput_4M",
        "value": headline,
        "unit": "Mphotons/s",
        "vs_baseline": headline,
        "config": {"volume": scene.volume.data.shape[0], "photons": n,
                   "lights": len(scene.lights),
                   "max_interactions": config.tracer.max_interactions,
                   "image": w},
        "metrics": metrics,
        "stages": stages,
    }))


def run_config3(reps: int):
    """BASELINE config 3: 256^3 CT-head-like volume with guided photon
    emission — a pilot wave measures per-light-plane-bin contribution
    (ops/emit.py:emission_guide_from_wave), subsequent waves sample the
    light plane by its inverse CDF. Reports the equal-photon variance
    reduction of the light-volume estimate vs uniform emission, the
    estimator bias, and guided trace+splat throughput."""
    import numpy as np

    from cpm_tpu.core.camera import Camera
    from cpm_tpu.core.config import (PipelineConfig, RecomputeConfig,
                                     RenderConfig, TracerConfig)
    from cpm_tpu.core.lights import Light
    from cpm_tpu.core.scene import Scene
    from cpm_tpu.core.types import TransferFunction, Volume
    from cpm_tpu.io import synthetic
    from cpm_tpu.ops import emit as emit_mod
    from cpm_tpu.ops import sampling
    from cpm_tpu.pipeline import step as pstep
    from cpm_tpu.utils.benchmark import readback, timeit_chained

    volume = Volume.from_data(synthetic.ct_head_like(256))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    light = Light.directional((0.2, -1.0, 0.3))
    scene = Scene.create(volume, tf, tfs, [light], Camera.create())
    cfg = PipelineConfig(
        photons_x=256, photons_y=256,
        tracer=TracerConfig(max_interactions=4, max_steps=8000),
        recompute=RecomputeConfig(max_photons_fraction=0.1),
        render=RenderConfig(width=512, height=512))
    floor = 0.25

    def wave(guide, seed):
        grid = sampling.stratified_grid_2d(cfg.photons_x, cfg.photons_y)
        if guide is not None:
            grid = sampling.warp_samples_2d(grid, guide, floor=floor)
        ls = emit_mod.emit(light, grid,
                           key=jax.random.fold_in(
                               jax.random.PRNGKey(seed), 7))
        st = pstep.init_state(scene, cfg, seed=seed, light_samples=ls)
        st = pstep.full_trace_step(scene, st, cfg)
        return st, grid

    # Pilot wave (uniform) -> adaptive contribution guide.
    pilot, pilot_grid = wave(None, 999)
    guide = emit_mod.emission_guide_from_wave(
        pilot_grid[:, 0:2], pilot_grid[:, 3], pilot.photons.powers,
        n_u=64, n_v=64)
    readback(guide)

    n_waves = 6
    lv_u = [np.asarray(wave(None, s)[0].light_volume)
            for s in range(n_waves)]
    lv_g = [np.asarray(wave(guide, s)[0].light_volume)
            for s in range(n_waves)]

    # Variance of the light-volume estimate: mean over bright cells of the
    # per-cell relative variance across waves (equal photons per wave).
    mean_u = np.mean(lv_u, axis=0)
    bright = mean_u.sum(-1) > np.percentile(mean_u.sum(-1), 90)

    def relvar(waves_):
        s = np.stack([w.sum(-1)[bright] for w in waves_])
        m = np.maximum(s.mean(0), 1e-12)
        return float(np.mean(s.var(0) / m ** 2))

    rel_var_u = relvar(lv_u)
    rel_var_g = relvar(lv_g)
    bias = abs(np.mean([x.sum() for x in lv_g])
               / max(np.mean([x.sum() for x in lv_u]), 1e-9) - 1.0)

    # Guided full-step throughput (chained; the warp happens in-jit).
    g0 = sampling.stratified_grid_2d(cfg.photons_x, cfg.photons_y)

    @jax.jit
    def g_step(s, key):
        grid = sampling.warp_samples_2d(g0, guide, floor=floor)
        ls = emit_mod.emit(light, grid, key=key)
        s = s.replace(light_samples=ls,
                      key=jax.random.fold_in(key, 1))
        out = pstep.full_trace_step(scene, s, cfg)
        return out, jax.random.fold_in(key, out.photons.iteration + 1)

    st0 = pilot
    readback(g_step(st0, st0.key)[0].light_volume)
    res = timeit_chained(lambda s, k: g_step(s, k), (st0, st0.key),
                         lambda a, o, i: o, reps=max(reps, 10), warmup=1)
    n = st0.photons.n
    metrics = {
        "trace_splat_ms": round(res.mean_ms, 2),
        "trace_splat_mphotons_s": round(n / res.mean_s / 1e6, 3),
        "bright_cell_rel_variance_uniform": round(rel_var_u, 6),
        "bright_cell_rel_variance_guided": round(rel_var_g, 6),
        "variance_reduction_x": round(rel_var_u / max(rel_var_g, 1e-12), 3),
        "total_irradiance_bias": round(float(bias), 4),
        "guide_floor": floor,
    }
    print(json.dumps({
        "metric": "guided_emission_variance_reduction",
        "value": metrics["variance_reduction_x"],
        "unit": "x (equal-photon rel-variance, bright cells)",
        "vs_baseline": metrics["variance_reduction_x"],
        "config": {"volume": 256, "photons": n, "max_interactions": 4,
                   "guide": [64, floor]},
        "metrics": metrics,
    }))


def run_config2(reps: int):
    """BASELINE config 2: 128^3 smoke volume, 256k photons, progressive
    accumulation over 16 passes — per-pass latency plus the accumulator's
    noise decay (the progressive-refinement contract: relative wave-to-
    wave change of the running average shrinks ~1/n)."""
    import numpy as np

    from cpm_tpu.pipeline import step as pstep
    from cpm_tpu.utils.benchmark import readback

    import time as _time

    scene, config = build(128, (512, 512), 4, width=512)
    state = pstep.full_trace_step(scene, pstep.init_state(scene, config),
                                  config)
    readback(state.light_volume)
    # Warm the progressive-step compile outside the timed region.
    state = pstep.progressive_step(scene, state, config)
    readback(state.light_volume)

    n_pass = 16

    @jax.jit
    def step_delta(s, prev):
        # Delta computed IN-JIT: even a single eager jnp op between
        # dispatches costs ~100+ ms on the axon tunnel (round-5 finding).
        s2 = pstep.progressive_step(scene, s, config)
        acc = s2.light_volume_accum
        d = (jnp.sum(jnp.abs(acc - prev))
             / jnp.maximum(jnp.sum(jnp.abs(acc)), 1e-9))
        return s2, acc, d

    state, prev, _ = step_delta(state, state.light_volume_accum)
    readback(prev)  # warm the fused step+delta compile
    deltas = []
    t0 = _time.perf_counter()
    for _ in range(n_pass):
        state, prev, d = step_delta(state, prev)
        deltas.append(d)
    deltas = [float(x) for x in np.asarray(jnp.stack(deltas))]
    per_pass = (_time.perf_counter() - t0) / n_pass
    n = state.photons.n
    metrics = {
        "pass_ms": round(per_pass * 1e3, 2),
        "mphotons_s": round(n / per_pass / 1e6, 3),
        "passes": n_pass,
        "first_pass_rel_change": round(deltas[0], 4),
        "last_pass_rel_change": round(deltas[-1], 4),
        "monotone_converging": bool(deltas[-1] < deltas[0]),
    }
    print(json.dumps({
        "metric": "progressive_pass_throughput",
        "value": metrics["mphotons_s"],
        "unit": "Mphotons/s per progressive pass (256k photons, 16 passes)",
        "vs_baseline": metrics["mphotons_s"],
        "config": {"volume": 128, "photons": n, "max_interactions": 4,
                   "passes": n_pass},
        "metrics": metrics,
    }))


def run_config4(reps: int):
    """BASELINE config 4: time-varying 128^3 x 32-step sequence played with
    correlated selective recomputation vs full retraces — per-step latency
    of both paths plus the light-volume agreement of the selective one."""
    import numpy as np

    from cpm_tpu.core.camera import Camera
    from cpm_tpu.core.config import (PipelineConfig, RecomputeConfig,
                                     RenderConfig, TracerConfig)
    from cpm_tpu.core.lights import Light
    from cpm_tpu.core.scene import Scene
    from cpm_tpu.core.types import TransferFunction, Volume
    from cpm_tpu.io import synthetic
    from cpm_tpu.pipeline import step as pstep
    from cpm_tpu.pipeline import timevarying as tv
    from cpm_tpu.utils.benchmark import readback

    import time as _time

    vols = synthetic.time_varying_sequence(128, 32, seed=0)
    seq = tv.VolumeSequence.prepare(vols)
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(Volume.from_data(jnp.asarray(vols[0])), tf, tfs,
                         [Light.directional((0.0, -1.0, 0.3))],
                         Camera.create())
    config = PipelineConfig(
        photons_x=256, photons_y=256,
        tracer=TracerConfig(max_interactions=4, max_steps=6000),
        recompute=RecomputeConfig(max_photons_fraction=0.1),
        render=RenderConfig(width=512, height=512))
    state0 = pstep.full_trace_step(scene, pstep.init_state(scene, config),
                                   config)
    readback(state0.light_volume)

    n_play = 8
    budget = pstep.recompute_budget(config, state0.photons.n)
    from cpm_tpu.ops import importance as imp_mod
    weights = imp_mod.ImportanceWeights().normalized()

    def play(correlated, drain=True):
        """Advance n_play steps; the correlated path DRAINS every flagged
        photon before the next time step (the reference's progressive
        timer between steps, progressivephotontracercl.cpp:534-540), so
        the selective result is comparable to a full retrace."""
        sc, st = scene, state0
        t0 = _time.perf_counter()
        lvs, batches = [], 0
        for t in range(1, n_play + 1):
            sc, st = tv.advance_time(sc, st, seq, float(t), config,
                                     correlated=correlated)
            batches += 1
            if correlated and drain:
                d, h, w = seq.volumes.shape[1:]
                ig = tv.time_step_importance(
                    seq.minmax, seq.diff, jnp.float32(t),
                    sc.tf.positions, sc.tf.colors, (d, h, w),
                    seq.cell_size, weights)
                while int(st.n_remaining) > 0 and batches < 64 * n_play:
                    st = pstep.correlated_step(sc, st, config, ig, budget)
                    batches += 1
            lvs.append(st.light_volume)
        readback(st.light_volume)
        return (_time.perf_counter() - t0) / n_play, lvs, batches

    # Warm all compile paths, then measure: the interactive policy (ONE
    # selective batch per time step, error drains over subsequent frames
    # exactly like the reference's 100 ms progressive timer) and the
    # drained-to-convergence policy (comparable to a full retrace).
    play(True, drain=False)
    play(True, drain=True)
    play(False)
    one_s, lv_1, _ = play(True, drain=False)
    drained_s, lv_c, n_batches = play(True, drain=True)
    full_s, lv_f, _ = play(False)

    def rel_errs(a_list):
        return [float(jnp.sum(jnp.abs(a - b)) / jnp.maximum(
            jnp.sum(jnp.abs(b)), 1e-9)) for a, b in zip(a_list, lv_f)]

    errs_drained = rel_errs(lv_c)
    errs_single = rel_errs(lv_1)
    metrics = {
        "single_batch_ms": round(one_s * 1e3, 2),
        "single_batch_speedup_x": round(full_s / one_s, 2),
        "single_batch_transient_rel_l1": round(
            float(np.mean(errs_single)), 4),
        "drained_ms": round(drained_s * 1e3, 2),
        "drain_batches_per_step": round(n_batches / n_play, 2),
        "drained_rel_l1_max": round(float(np.max(errs_drained)), 6),
        "full_step_ms": round(full_s * 1e3, 2),
        "steps_played": n_play,
    }
    print(json.dumps({
        "metric": "timevarying_correlated_speedup",
        "value": metrics["single_batch_speedup_x"],
        "unit": "x vs full retrace per time step (single selective batch; "
                "drains to <1e-4 agreement in drain_batches_per_step)",
        "vs_baseline": metrics["single_batch_speedup_x"],
        "config": {"volume": 128, "steps": 32, "photons": 65536,
                   "max_interactions": 4, "budget_frac": 0.1},
        "metrics": metrics,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--large", action="store_true",
                    help="config-5 scale proof on one chip: 4M / 256^3")
    ap.add_argument("--large512", action="store_true",
                    help="BASELINE config 5 AS WRITTEN: 512^3, 2 lights, "
                         "4M photons, 1024^2 (single-chip slice)")
    ap.add_argument("--config2", action="store_true",
                    help="BASELINE config 2: 256k photons, 16 progressive "
                         "passes (config 1 = examples/render_sphere.py)")
    ap.add_argument("--config3", action="store_true",
                    help="BASELINE config 3: 256^3 CT head, guided emission")
    ap.add_argument("--config4", action="store_true",
                    help="BASELINE config 4: time-varying 128^3 x 32 steps")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from cpm_tpu.core.camera import Camera
    from cpm_tpu.ops import splat as splat_mod
    from cpm_tpu.ops import sweep_render
    from cpm_tpu.ops import tracer as tracer_mod
    from cpm_tpu.pipeline import step as pstep
    from cpm_tpu.utils.benchmark import timeit

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    if args.large:
        scene, config = build(256, (2048, 2048), 4, width=1024)
        run_large(scene, config, args.reps)
        return
    if args.large512:
        # BASELINE config 5 as written: 512^3 volume, 2 directional
        # lights (2M samples each = 4.2M photons), 1024^2 camera. The
        # multi-host sharding of this workload is exercised by
        # parallel/multihost.py on the virtual mesh; this proves the
        # single-chip slice fits and runs. brick_scale=4: the 8x-expanded
        # scale-2 brick table would be 17 GB at 512^3; scale 4 fits in
        # 5.4 GB at ~1.4x the per-fetch row-width cost.
        from dataclasses import replace as _dcr
        scene, config = build(512, (2048, 1024), 4, width=1024, n_lights=2)
        config = _dcr(config, tracer=_dcr(config.tracer, brick_scale=4))
        run_large(scene, config, args.reps)
        return
    if args.config2:
        run_config2(args.reps)
        return
    if args.config3:
        run_config3(args.reps)
        return
    if args.config4:
        run_config4(args.reps)
        return
    scene, config = build(128, (256, 256), 4, width=512)
    # Chained-protocol rep count: the per-rep readback floor on the axon
    # tunnel is ~26-55 ms (utils/benchmark.py round-5 calibration), so
    # steady-state stage times use a PURE dispatch chain with one final
    # readback; more reps amortize the single floor further.
    reps = max(args.reps, 20)

    from cpm_tpu.utils.benchmark import (feedback_scalar, readback,
                                         timeit_chained)

    state = pstep.init_state(scene, config)
    n_photons = state.photons.n
    stages: dict[str, dict] = {}
    metrics: dict[str, float] = {}

    def record(name, res, n_items=None, unit_scale=1e6):
        stages[name] = {"ms": round(res.mean_ms, 2)}
        if n_items is not None:
            stages[name]["mitems_s"] = round(n_items / res.mean_s / unit_scale, 3)

    pure = lambda a, o, i: (o,)
    take0 = lambda a, o, i: (o[0],)

    # --- full step: emit + trace + splat (key advanced inside jit so every
    #     chained dispatch computes a fresh wave) ---
    @jax.jit
    def g_step(s):
        return pstep.full_trace_step(
            scene, s.replace(key=jax.random.fold_in(s.key, 1)), config)

    t0 = time.perf_counter()
    out = g_step(state)
    readback(out.light_volume)
    print(f"full_step compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    res = timeit_chained(g_step, (out,), pure, reps=reps, warmup=1)
    record("trace_splat", res, n_photons)
    metrics["trace_splat_mphotons_s"] = round(n_photons / res.mean_s / 1e6, 3)
    metrics["trace_splat_ms"] = round(res.mean_ms, 2)

    # --- trace only ---
    @jax.jit
    def g_trace(key):
        ph = tracer_mod.trace_photons(
            scene.volume, scene.tf, scene.tf_scattering, state.light_samples,
            key, config.tracer)
        fb = feedback_scalar(ph.positions)
        return jax.random.fold_in(key, fb.astype(jnp.uint32)), fb

    res = timeit_chained(g_trace, (state.key,), take0, reps=reps, warmup=1)
    record("trace", res, n_photons)
    metrics["trace_mphotons_s"] = round(n_photons / res.mean_s / 1e6, 3)

    # --- splat only ---
    dim = pstep.light_volume_shape(config)
    fp = pstep.splat_footprint(config)
    method = pstep.splat_method(config)

    @jax.jit
    def g_splat(ph):
        lv = splat_mod.splat_all(ph, dim, fp, method=method)
        fb = feedback_scalar(lv)
        return ph.replace(powers=ph.powers * (0.999999 + 1e-6 * fb)), fb

    res = timeit_chained(g_splat, (out.photons,), take0, reps=reps, warmup=1)
    record("splat", res, n_photons)
    metrics["splat_ms"] = round(res.mean_ms, 2)

    # --- render (shear-warp MXU sweep; input light volume chained) ---
    w = config.render.width
    cam = Camera.create(eye=(0.4, 0.6, -1.4))

    @jax.jit
    def g_render(lv):
        img = sweep_render.sweep_render(
            scene.volume, scene.tf, lv, cam, config.render)
        fb = feedback_scalar(img)
        return lv * (0.999999 + 1e-6 * fb), fb

    res = timeit_chained(g_render, (out.light_volume_accum,), take0,
                         reps=reps, warmup=2)
    record("render", res, w * w)
    metrics["render_mrays_s"] = round(w * w / res.mean_s / 1e6, 3)
    metrics["render_ms"] = round(res.mean_ms, 2)
    metrics["render_inter_dims"] = [
        int(config.render.width * config.render.inter_scale),
        int(config.render.height * config.render.inter_scale)]

    # --- correlated selective-recompute step (10% budget, fresh round each
    #     rep: drain bookkeeping cleared, key advanced, state chained) ---
    imp = pstep.build_importance_grid(scene, config)
    budget = pstep.recompute_budget(config, n_photons)

    @jax.jit
    def g_corr(s):
        s2 = s.replace(key=jax.random.fold_in(s.key, 1),
                       retraced=jnp.zeros_like(s.retraced),
                       n_remaining=jnp.int32(0))
        return pstep.correlated_step(scene, s2, config, imp, budget)

    res = timeit_chained(g_corr, (out,), pure, reps=reps, warmup=1)
    record("correlated", res, budget)
    metrics["correlated_ms"] = round(res.mean_ms, 2)
    metrics["correlated_retrace_mphotons_s"] = round(
        budget / res.mean_s / 1e6, 3)

    # --- end-to-end interactive frame: correlated update + render ---
    frame_ms = metrics["correlated_ms"] + metrics["render_ms"]
    metrics["interactive_frame_ms"] = round(frame_ms, 2)

    # --- fused packed frame: correlated + render as ONE 7-leaf dispatch
    #     (pipeline/packed.py; beats the ~0.4 ms/leaf tunnel dispatch tax) ---
    from cpm_tpu.pipeline import packed as packed_mod
    p0 = packed_mod.pack_state(out)
    cam0 = scene.camera

    def g_frame(p):
        p2, img = packed_mod.interactive_frame(scene, p, cam0, imp, config,
                                               budget, fresh_round=True)
        return p2

    readback(g_frame(p0).light_volume)
    res = timeit_chained(g_frame, (p0,), pure, reps=reps, warmup=1)
    record("fused_frame", res, budget)
    metrics["interactive_frame_fused_ms"] = round(res.mean_ms, 2)

    def g_corr_packed(p):
        p2, _ = packed_mod.interactive_frame(scene, p, cam0, imp, config,
                                             budget, fresh_round=True,
                                             do_render=False)
        return p2

    readback(g_corr_packed(p0).light_volume)
    res = timeit_chained(g_corr_packed, (p0,), pure, reps=reps, warmup=1)
    record("correlated_packed", res, budget)
    metrics["correlated_packed_ms"] = round(res.mean_ms, 2)

    for name, v in stages.items():
        print(f"  {name:>12}: {v}", file=sys.stderr)

    headline = metrics["trace_mphotons_s"]
    # The reference publishes NO numbers (BASELINE.md table); the only
    # well-defined ratio is progress vs this framework's own first honest
    # measurement of the same stage (round 2, BENCH_r02.json: 0.113
    # Mphotons/s trace at the identical 65k/128^3/4-interaction config).
    baseline_mphotons_s = 0.113
    print(json.dumps({
        "metric": "photon_trace_throughput",
        "value": headline,
        "unit": "Mphotons/s",
        "vs_baseline": round(headline / baseline_mphotons_s, 3),
        "baseline_note": "ratio vs round-2 first honest self-measurement "
                         "(reference publishes no numbers, BASELINE.md)",
        "config": {"volume": scene.volume.data.shape[0],
                   "photons": n_photons,
                   "max_interactions": config.tracer.max_interactions,
                   "image": w},
        "metrics": metrics,
        "stages": stages,
    }))


if __name__ == "__main__":
    main()
