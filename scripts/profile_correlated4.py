"""Knockout profile: the full correlated step with individual stages
stubbed out, all inside one jitted scan. Reveals composition overheads the
isolated per-stage profile misses."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cpm_tpu.core.types import LightSamples
from cpm_tpu.ops import path_importance, select, splat
from cpm_tpu.ops import tracer as tracer_mod
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.utils.benchmark import readback

import bench as bench_mod

K = 10


def scan_time(name, body, init_carry):
    f = jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(K))[0])
    out = f(init_carry)
    readback(out)
    t0 = time.perf_counter()
    out = f(init_carry)
    readback(out)
    dt = time.perf_counter() - t0
    print(f"{name:>34}: {dt / K * 1e3:7.2f} ms/iter")


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    scene, config = bench_mod.build(128, (256, 256), 4, width=512)
    state = pstep.init_state(scene, config)
    out = pstep.full_trace_step(scene, state, config)
    readback(out.light_volume)
    imp_grid = pstep.build_importance_grid(scene, config)
    budget = pstep.recompute_budget(config, state.photons.n)
    dim = pstep.light_volume_shape(config)
    fp = pstep.splat_footprint(config)
    method = pstep.splat_method(config)

    def step_variant(s, use_importance=True, do_retrace=True, do_splat=True,
                     do_merge=True):
        photons = s.photons.replace(
            iteration=jnp.int32(0),
            radius_rel=jnp.float32(config.tracer.radius_rel))
        if use_importance:
            imp = pstep.recompute_importance(config, imp_grid, photons,
                                             s.light_samples)
        else:
            imp = path_importance.equal_importance(photons.n,
                                                   s.recompute_phase, 10)
        indices, valid, n_remaining = select.select_photons_to_recompute(
            imp, budget, exclude=s.retraced)
        safe = jnp.where(valid, indices, 0)
        ls = s.light_samples
        sub = LightSamples(
            origins=ls.origins[safe], directions=ls.directions[safe],
            powers=ls.powers[safe],
            tspan=jnp.where(valid[:, None], ls.tspan[safe],
                            jnp.array([0.0, -1.0], jnp.float32)),
            iteration=ls.iteration)
        if do_retrace:
            new = tracer_mod.trace_photons(
                scene.volume, scene.tf, scene.tf_scattering, sub,
                jax.random.fold_in(s.key, 0), config.tracer, lane_ids=safe)
            new = new.replace(radius_rel=photons.radius_rel,
                              scene_radius=photons.scene_radius,
                              iteration=jnp.int32(0))
        else:
            new = photons.replace(
                positions=photons.positions[:, safe],
                powers=photons.powers[:, safe],
                directions=photons.directions[:, safe],
                exit_power=photons.exit_power[safe],
                exit_direction=photons.exit_direction[safe])
        if do_merge:
            merged = tracer_mod.merge_recomputed(photons, new, indices, valid)
        else:
            merged = photons
        if do_splat:
            removed = splat.splat_selected(photons, indices, valid, dim, fp,
                                           method=method)
            added = splat.splat_selected(merged, indices, valid, dim, fp,
                                         method=method)
            lv = s.light_volume - removed + added
        else:
            lv = s.light_volume
        drop_invalid = jnp.where(valid, indices, photons.n)
        retraced = s.retraced.at[drop_invalid].set(True, mode="drop")
        return s.replace(
            photons=merged, light_volume=lv, light_volume_accum=lv,
            retraced=jnp.where(n_remaining > 0, retraced,
                               jnp.zeros_like(retraced)),
            n_remaining=n_remaining,
            recompute_phase=s.recompute_phase + 1)

    def mk(name, **kw):
        def body(c, i):
            s = c.replace(key=jax.random.fold_in(c.key, i),
                          retraced=jnp.zeros_like(c.retraced),
                          n_remaining=jnp.int32(0))
            return step_variant(s, **kw), None
        scan_time(name, body, out)

    mk("full")
    mk("no importance (equal)", use_importance=False)
    mk("no retrace", do_retrace=False)
    mk("no splats", do_splat=False)
    mk("no merge", do_merge=False)
    mk("no retrace+no splat", do_retrace=False, do_splat=False)
    mk("select only", use_importance=False, do_retrace=False,
       do_splat=False, do_merge=False)


if __name__ == "__main__":
    main()
