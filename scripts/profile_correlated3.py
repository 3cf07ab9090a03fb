"""Scan-loop profile: run K reps of each correlated-step component INSIDE
one jitted lax.scan (carry-dependent inputs so XLA cannot dedupe), one
dispatch + one readback -> true device ms/iteration, no host overhead."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cpm_tpu.ops import select, splat
from cpm_tpu.ops import tracer as tracer_mod
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.utils.benchmark import readback

import bench as bench_mod

K = 10


def scan_time(name, body, init_carry):
    f = jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(K))[0])
    out = f(init_carry)  # compile + first
    readback(out)
    t0 = time.perf_counter()
    out = f(init_carry)
    readback(out)
    dt = time.perf_counter() - t0
    print(f"{name:>28}: {dt / K * 1e3:7.2f} ms/iter")


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    scene, config = bench_mod.build(128, (256, 256), 4, width=512)
    state = pstep.init_state(scene, config)
    out = pstep.full_trace_step(scene, state, config)
    readback(out.light_volume)
    imp_grid = pstep.build_importance_grid(scene, config)
    budget = pstep.recompute_budget(config, state.photons.n)
    n = state.photons.n

    # full correlated step
    def body_full(c, i):
        s = c.replace(key=jax.random.fold_in(c.key, i),
                      retraced=jnp.zeros_like(c.retraced),
                      n_remaining=jnp.int32(0))
        return pstep.correlated_step(scene, s, config, imp_grid, budget), None
    scan_time("correlated_step (full)", body_full, out)

    # importance
    def body_imp(c, i):
        ph = out.photons.replace(powers=out.photons.powers + c * 1e-9)
        r = pstep.recompute_importance(config, imp_grid, ph,
                                       out.light_samples)
        return r[0], None
    scan_time("recompute_importance", body_imp, jnp.float32(0.0))

    imp = pstep.recompute_importance(config, imp_grid, out.photons,
                                     out.light_samples)
    excl = jnp.zeros(n, bool)

    def body_sel(c, i):
        idx, valid, nr = select.select_photons_to_recompute(
            imp + c * 1e-9, budget, exclude=excl)
        return idx[0].astype(jnp.float32), None
    scan_time("select (top_k+argsort)", body_sel, jnp.float32(0.0))

    def body_sel2(c, i):
        idx, valid, nr = select.select_photons_to_recompute(
            imp + c * 1e-9, budget, exclude=excl, spatial_sort=False)
        return idx[0].astype(jnp.float32), None
    scan_time("select (no spatial sort)", body_sel2, jnp.float32(0.0))

    indices, valid, nr = select.select_photons_to_recompute(
        imp, budget, exclude=excl)
    safe = jnp.where(valid, indices, 0)
    from cpm_tpu.core.types import LightSamples
    ls = out.light_samples
    sub = LightSamples(origins=ls.origins[safe],
                      directions=ls.directions[safe],
                      powers=ls.powers[safe],
                      tspan=jnp.where(valid[:, None], ls.tspan[safe],
                                      jnp.array([0.0, -1.0], jnp.float32)),
                      iteration=ls.iteration)

    def body_trace(c, i):
        r = tracer_mod.trace_photons(
            scene.volume, scene.tf, scene.tf_scattering, sub,
            jax.random.fold_in(out.key, i), config.tracer, lane_ids=safe)
        return c + r.positions[0, 0, 0] * 0.0, None
    scan_time("retrace budget lanes", body_trace, jnp.float32(0.0))

    dim = pstep.light_volume_shape(config)
    fp = pstep.splat_footprint(config)
    method = pstep.splat_method(config)

    def body_splat(c, i):
        ph = out.photons.replace(powers=out.photons.powers + c * 1e-9)
        g = splat.splat_selected(ph, indices, valid, dim, fp, method=method)
        return g[0, 0, 0, 0], None
    scan_time(f"splat_selected ({method})", body_splat, jnp.float32(0.0))

    new = tracer_mod.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, sub, out.key,
        config.tracer, lane_ids=safe)

    def body_merge(c, i):
        ph = out.photons.replace(powers=out.photons.powers + c * 1e-9)
        m = tracer_mod.merge_recomputed(ph, new, indices, valid)
        return m.positions[0, 0, 0], None
    scan_time("merge_recomputed", body_merge, jnp.float32(0.0))


if __name__ == "__main__":
    main()
