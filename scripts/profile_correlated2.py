"""Chained-dependency profile of the correlated step: removes the per-rep
host-readback latency by threading each rep's output into the next rep's
input, one readback at the end (utils/benchmark.timeit_chained)."""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cpm_tpu.ops import path_importance, select, splat
from cpm_tpu.ops import tracer as tracer_mod
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.utils.benchmark import readback, timeit_chained

import bench as bench_mod


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    scene, config = bench_mod.build(128, (256, 256), 4, width=512)
    state = pstep.init_state(scene, config)
    out = pstep.full_trace_step(scene, state, config)
    readback(out.light_volume)
    imp_grid = pstep.build_importance_grid(scene, config)
    budget = pstep.recompute_budget(config, state.photons.n)
    n = state.photons.n

    def t(name, fn, init_args, chain, reps=20):
        res = timeit_chained(fn, init_args, chain, reps=reps, warmup=2)
        print(f"{name:>28}: {res.mean_ms:7.2f} ms")
        return res

    # 0. dispatch floor: trivial jitted op on a small array
    f0 = jax.jit(lambda x: x * 1.000001 + 0.5)
    t("trivial op (floor)", f0, (jnp.ones((256,)),),
      lambda a, o, i: (o,), reps=50)

    # 1. full correlated step, state chained through
    t("correlated_step (full)",
      lambda s: pstep.correlated_step(scene, s, config, imp_grid, budget),
      (out,), lambda a, o, i: (o.replace(
          key=jax.random.fold_in(o.key, i),
          retraced=jnp.zeros_like(o.retraced),
          n_remaining=jnp.int32(0)),))

    # 2. importance integration, photons perturbed by output checksum
    f_imp = jax.jit(lambda ph, ls: pstep.recompute_importance(
        config, imp_grid, ph, ls))
    t("recompute_importance",
      lambda ph: f_imp(ph, out.light_samples), (out.photons,),
      lambda a, o, i: (a[0].replace(
          powers=a[0].powers * (1.0 + 1e-9 * o[0])),))

    imp = f_imp(out.photons, out.light_samples)
    excl = jnp.zeros(n, bool)
    f_sel = jax.jit(lambda im, ex: select.select_photons_to_recompute(
        im, budget, exclude=ex))
    t("select (top_k+argsort)", lambda im: f_sel(im, excl),
      (imp,), lambda a, o, i: (a[0] * (1.0 + 1e-9 * o[1][0]),))

    indices, valid, n_remaining = f_sel(imp, excl)
    safe = jnp.where(valid, indices, 0)
    from cpm_tpu.core.types import LightSamples
    ls = out.light_samples
    sub = LightSamples(origins=ls.origins[safe],
                      directions=ls.directions[safe],
                      powers=ls.powers[safe],
                      tspan=jnp.where(valid[:, None], ls.tspan[safe],
                                      jnp.array([0.0, -1.0], jnp.float32)),
                      iteration=ls.iteration)
    f_trace = lambda k: tracer_mod.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, sub, k, config.tracer,
        lane_ids=safe).positions
    t("retrace budget lanes", f_trace, (out.key,),
      lambda a, o, i: (jax.random.fold_in(out.key, i + o[0, 0, 0].astype(
          jnp.int32) % 2),))

    dim = pstep.light_volume_shape(config)
    fp = pstep.splat_footprint(config)
    method = pstep.splat_method(config)
    t(f"splat_selected ({method})",
      lambda ph: splat.splat_selected(ph, indices, valid, dim, fp,
                                      method=method),
      (out.photons,),
      lambda a, o, i: (a[0].replace(
          powers=a[0].powers * (1.0 + 1e-9 * o[0, 0, 0, 0])),))

    new = tracer_mod.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, sub, out.key,
        config.tracer, lane_ids=safe)
    f_merge = jax.jit(lambda ph, nw: tracer_mod.merge_recomputed(
        ph, nw, indices, valid))
    t("merge_recomputed", lambda ph: f_merge(ph, new), (out.photons,),
      lambda a, o, i: (o,))


if __name__ == "__main__":
    main()
