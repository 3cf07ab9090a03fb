"""Stage profile of correlated_step_scalable at 4M photons / 256^3."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cpm_tpu.ops import splat_binned, tracer as tracer_mod
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.utils.benchmark import readback

import bench as bench_mod


def stage(name, thunk):
    t0 = time.perf_counter()
    out = thunk()
    readback(out)
    print(f"{name:>28}: {(time.perf_counter()-t0)*1e3:8.1f} ms")
    return out


def main():
    scene, config = bench_mod.build(256, (2048, 2048), 4, width=1024)
    state = pstep.init_state(scene, config)
    readback(state.light_samples.tspan)
    n = state.photons.n
    chunk = 1 << 19
    photons = tracer_mod.trace_photons_chunked(
        scene.volume, scene.tf, scene.tf_scattering, state.light_samples,
        jax.random.fold_in(state.key, 0), config.tracer, chunk)
    photons = photons.replace(
        radius_rel=jnp.float32(config.tracer.radius_rel),
        scene_radius=scene.volume.scene_radius())
    readback(photons.exit_power)
    dim = pstep.light_volume_shape(config)
    fp = pstep.splat_footprint(config)
    lv = splat_binned.splat_all_binned(photons, dim, fp)
    readback(lv)
    big = state.replace(photons=photons, light_volume=lv,
                        light_volume_accum=lv)
    imp_grid = pstep.build_importance_grid(scene, config)
    budget = pstep.recompute_budget(config, n)
    print(f"n={n} budget={budget}", file=sys.stderr)

    # Warm compile of everything once.
    out = pstep.correlated_step_scalable(scene, big, config, imp_grid,
                                         budget)
    readback(out.light_volume)

    for rep in range(2):
        s = big.replace(key=jax.random.fold_in(big.key, 50 + rep))
        t0 = time.perf_counter()
        sel = stage("select half (imp+topk+gather)",
                    lambda: pstep._correlated_select(
                        scene, s, config, imp_grid, budget))
        photons2, indices, valid, safe, n_remaining, sub = sel
        new = stage("retrace budget", lambda: tracer_mod.trace_photons(
            scene.volume, scene.tf, scene.tf_scattering, sub,
            jax.random.fold_in(s.key, jnp.int32(0)), config.tracer,
            lane_ids=safe))
        merged = stage("merge", lambda: tracer_mod.merge_recomputed(
            photons2, new, indices, valid))
        op, opw = pstep._gather_selected_flat(photons2, indices, valid)
        np_, npw = pstep._gather_selected_flat(merged, indices, valid)
        readback((op, np_))
        from cpm_tpu.core.types import relative_irradiance_scale
        from cpm_tpu.core import constants as C
        scale = (jnp.float32(C.ISOTROPIC_PHASE)
                 * relative_irradiance_scale(photons2.n, photons2.radius_rel))
        stage("binned splat removed", lambda: splat_binned.splat_binned_flat(
            op, opw, photons2.radius_rel, scale, dim, fp))
        stage("binned splat added", lambda: splat_binned.splat_binned_flat(
            np_, npw, photons2.radius_rel, scale, dim, fp))
        print(f"  total loop: {(time.perf_counter()-t0)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
