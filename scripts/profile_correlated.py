"""Per-stage knockout profile of the 65k correlated step (VERDICT r4 #2).

Times each component of correlated_step in isolation with the honest
readback protocol, to locate the constant terms that keep the correlated
update from being budget-proportional."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cpm_tpu.ops import path_importance, select, splat
from cpm_tpu.ops import tracer as tracer_mod
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.utils.benchmark import readback, timeit

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
    print(f"budget={budget} n={n}", file=sys.stderr)

    def t(name, fn, make_args, reps=5):
        res = timeit(fn, make_args, reps=reps, warmup=2)
        print(f"{name:>28}: {res.mean_ms:7.2f} ms")
        return res

    states = [out.replace(key=jax.random.fold_in(out.key, 50 + i))
              for i in range(4)]

    # 1. full correlated step (baseline)
    t("correlated_step (full)",
      lambda s: pstep.correlated_step(scene, s, config, imp_grid,
                                      budget).light_volume,
      lambda i: (states[i % 4],))

    # 2. importance integration only
    f_imp = jax.jit(lambda ph, ls: pstep.recompute_importance(
        config, imp_grid, ph, ls))
    phs = [out.photons.replace(powers=out.photons.powers * (1 + 0.01 * i))
           for i in range(4)]
    t("recompute_importance", lambda ph: f_imp(ph, out.light_samples),
      lambda i: (phs[i % 4],))

    imp = f_imp(out.photons, out.light_samples)
    imps = [imp * (1.0 + 0.01 * i) for i in range(4)]

    # 3. selection only
    f_sel = jax.jit(lambda im, ex: select.select_photons_to_recompute(
        im, budget, exclude=ex), static_argnums=())
    excl = jnp.zeros(n, bool)
    t("select (top_k+argsort)", lambda im: f_sel(im, excl)[0],
      lambda i: (imps[i % 4],))

    indices, valid, n_remaining = f_sel(imp, excl)

    # 4. sub-bundle gather + retrace of budget lanes
    safe = jnp.where(valid, indices, 0)
    from cpm_tpu.core.types import LightSamples
    ls = out.light_samples
    sub = LightSamples(origins=ls.origins[safe], directions=ls.directions[safe],
                      powers=ls.powers[safe],
                      tspan=jnp.where(valid[:, None], ls.tspan[safe],
                                      jnp.array([0.0, -1.0], jnp.float32)),
                      iteration=ls.iteration)
    keys = [jax.random.fold_in(out.key, 100 + i) for i in range(4)]
    f_trace = lambda k: tracer_mod.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, sub, k, config.tracer,
        lane_ids=safe).positions
    t("retrace budget lanes", f_trace, lambda i: (keys[i % 4],))

    # 5. splat_selected (one pass), default method
    dim = pstep.light_volume_shape(config)
    fp = pstep.splat_footprint(config)
    method = pstep.splat_method(config)
    t(f"splat_selected ({method})",
      lambda ph: splat.splat_selected(ph, indices, valid, dim, fp,
                                      method=method),
      lambda i: (phs[i % 4],))
    t("splat_selected (scatter)",
      lambda ph: splat.splat_selected(ph, indices, valid, dim, fp,
                                      method="scatter"),
      lambda i: (phs[i % 4],))

    # 6. merge only
    new = tracer_mod.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, sub, keys[0],
        config.tracer, lane_ids=safe)
    f_merge = jax.jit(lambda ph, nw: tracer_mod.merge_recomputed(
        ph, nw, indices, valid).positions)
    t("merge_recomputed", lambda ph: f_merge(ph, new),
      lambda i: (phs[i % 4],))


if __name__ == "__main__":
    main()
