"""Importance-guided photon emission (BASELINE config 3).

Three properties:
  1. The inverse-CDF warp produces samples whose histogram matches the
     target mixture density, and the pdf column is the true density
     (Monte-Carlo integration of a known function stays unbiased).
  2. Guided emission leaves the EXPECTED light volume unchanged vs uniform
     emission (power/pdf bookkeeping) within Monte-Carlo noise.
  3. On a scene whose importance concentrates in a small region, guided
     emission reduces the variance of that region's irradiance estimate at
     equal photon count.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import (PipelineConfig, RecomputeConfig,
                                 RenderConfig, TracerConfig)
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, UniformGrid3D, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import emit as emit_mod
from cpm_tpu.ops import sampling
from cpm_tpu.pipeline import step as pstep


class TestWarp2D:
    def test_histogram_matches_density_and_pdf_is_exact(self):
        bv, bu = 8, 8
        key = jax.random.PRNGKey(0)
        guide = jax.random.uniform(key, (bv, bu)) ** 3  # skewed
        n = 1 << 16
        u = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
        v = jax.random.uniform(jax.random.fold_in(key, 2), (n,))
        s = jnp.stack([u, v, jnp.zeros(n), jnp.ones(n)], axis=-1)
        w = sampling.warp_samples_2d(s, guide, floor=0.2)
        w = np.asarray(w)
        assert w[:, 0].min() >= 0 and w[:, 0].max() <= 1
        assert w[:, 1].min() >= 0 and w[:, 1].max() <= 1

        # Expected bin probability vs empirical histogram.
        g = np.maximum(np.asarray(guide), 0)
        f = 0.8 * g / g.mean() + 0.2
        p_bin = f / f.sum()
        hist, _, _ = np.histogram2d(w[:, 1], w[:, 0], bins=[bv, bu],
                                    range=[[0, 1], [0, 1]])
        emp = hist / n
        np.testing.assert_allclose(emp, p_bin, atol=4.0 / np.sqrt(n))

        # pdf column equals the true density at the warped point.
        iv = np.clip((w[:, 1] * bv).astype(int), 0, bv - 1)
        iu = np.clip((w[:, 0] * bu).astype(int), 0, bu - 1)
        np.testing.assert_allclose(w[:, 3], f[iv, iu], rtol=1e-4)

        # Unbiased MC integration of a smooth test function.
        def test_fn(uu, vv):
            return np.sin(3 * uu) * (vv ** 2) + 0.3
        est = np.mean(test_fn(w[:, 0], w[:, 1]) / w[:, 3])
        exact = ((1 - np.cos(3.0)) / 3.0) * (1.0 / 3.0) + 0.3
        assert abs(est - exact) < 0.01

    def test_uniform_guide_is_identity(self):
        guide = jnp.ones((4, 4))
        s = sampling.stratified_grid_2d(16, 16)
        w = sampling.warp_samples_2d(s, guide, floor=0.5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(s), atol=1e-6)


def _scene(dim=32):
    # A dense blob in one octant: importance concentrates there.
    z, y, x = np.mgrid[0:dim, 0:dim, 0:dim].astype(np.float32) / dim
    r = np.sqrt((x - 0.75) ** 2 + (y - 0.75) ** 2 + (z - 0.5) ** 2)
    data = np.clip(1.0 - r / 0.2, 0.0, 1.0).astype(np.float32)
    vol = Volume.from_data(jnp.asarray(data))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    return Scene.create(vol, tf, tfs,
                        [Light.directional((0.0, -1.0, 0.0))],
                        Camera.create())


def _wave_lv(scene, cfg, seed, guided, ig):
    st = pstep.init_state(scene, cfg, seed=seed,
                          importance_grid=ig if guided else None)
    st = pstep.full_trace_step(scene, st, cfg)
    return np.asarray(st.light_volume)


class TestGuidedEmission:
    def test_unbiased_and_variance_reduced(self):
        scene = _scene()
        from dataclasses import replace
        base = PipelineConfig(
            photons_x=48, photons_y=48,
            tracer=TracerConfig(max_interactions=2, max_steps=2500),
            render=RenderConfig(width=8, height=8),
            recompute=RecomputeConfig())
        guided_cfg = replace(base, guided_emission=True,
                             guide_resolution=16, guide_floor=0.15)
        ig = pstep.build_importance_grid(scene, base)
        assert float(jnp.max(ig.data)) > 0

        waves_u = [_wave_lv(scene, base, s, False, ig) for s in range(6)]
        waves_g = [_wave_lv(scene, guided_cfg, s, True, ig) for s in range(6)]
        mean_u = np.mean(waves_u, axis=0)
        mean_g = np.mean(waves_g, axis=0)

        # Unbiasedness: total deposited irradiance matches within MC noise.
        tot_u, tot_g = mean_u.sum(), mean_g.sum()
        assert abs(tot_g - tot_u) / max(tot_u, 1e-9) < 0.15

        # Variance reduction inside the important region (where photons
        # were steered): compare per-wave variance of the blob's summed
        # irradiance.
        d = mean_u.shape[0]
        blob = (slice(d // 4, 3 * d // 4), slice(d // 2, d),
                slice(d // 2, d))
        s_u = [w[blob].sum() for w in waves_u]
        s_g = [w[blob].sum() for w in waves_g]
        var_u = np.var(s_u) / max(np.mean(s_u), 1e-9) ** 2
        var_g = np.var(s_g) / max(np.mean(s_g), 1e-9) ** 2
        assert var_g < var_u, (var_g, var_u)

    def test_guide_projects_importance(self):
        scene = _scene()
        cfg = PipelineConfig(photons_x=16, photons_y=16)
        ig = pstep.build_importance_grid(scene, cfg)
        guide = emit_mod.build_emission_guide(ig, scene.lights[0],
                                              n_u=16, n_v=16)
        g = np.asarray(guide)
        assert g.min() >= 0 and g.max() > 0
        # The blob sits at x~0.75, z~0.5: the bright guide texels must be
        # a strict subset concentrated in one part of the plane.
        frac_bright = (g > 0.5 * g.max()).mean()
        assert 0 < frac_bright < 0.5


class TestAdaptiveGuide:
    def test_contribution_guide_reduces_variance_unbiased(self):
        """Two-pass adaptive guiding (pilot wave -> contribution guide ->
        guided waves): variance of the bright-cell estimate drops at equal
        photons, totals stay unbiased."""
        scene = _scene()
        cfg = PipelineConfig(
            photons_x=48, photons_y=48,
            tracer=TracerConfig(max_interactions=2, max_steps=2500),
            render=RenderConfig(width=8, height=8))
        light = scene.lights[0]

        def wave(guide, seed):
            grid = sampling.stratified_grid_2d(cfg.photons_x, cfg.photons_y)
            if guide is not None:
                grid = sampling.warp_samples_2d(grid, guide, floor=0.25)
            ls = emit_mod.emit(light, grid, key=jax.random.fold_in(
                jax.random.PRNGKey(seed), 7))
            st = pstep.init_state(scene, cfg, seed=seed, light_samples=ls)
            return pstep.full_trace_step(scene, st, cfg), grid

        pilot, pgrid = wave(None, 999)
        guide = emit_mod.emission_guide_from_wave(
            pgrid[:, 0:2], pgrid[:, 3], pilot.photons.powers,
            n_u=16, n_v=16)
        assert float(jnp.max(guide)) > 0

        n_w = 6
        lv_u = [np.asarray(wave(None, s)[0].light_volume)
                for s in range(n_w)]
        lv_g = [np.asarray(wave(guide, s)[0].light_volume)
                for s in range(n_w)]
        mean_u = np.mean(lv_u, axis=0)
        bright = mean_u.sum(-1) > np.percentile(mean_u.sum(-1), 90)

        def relvar(ws):
            s = np.stack([w.sum(-1)[bright] for w in ws])
            m = np.maximum(s.mean(0), 1e-12)
            return float(np.mean(s.var(0) / m ** 2))

        vu, vg = relvar(lv_u), relvar(lv_g)
        assert vg < vu, (vg, vu)
        tot_u = np.mean([x.sum() for x in lv_u])
        tot_g = np.mean([x.sum() for x in lv_g])
        assert abs(tot_g - tot_u) / tot_u < 0.15


class TestProgressiveGuided:
    def test_progressive_adaptive_refinement_unbiased(self):
        """progressive_step_guided: guide concentrates on the contributing
        region, each wave's energy stays unbiased vs uniform refinement,
        and the accumulator keeps averaging."""
        from dataclasses import replace

        scene = _scene()
        cfg = PipelineConfig(
            photons_x=48, photons_y=48,
            tracer=TracerConfig(max_interactions=2, max_steps=2500),
            render=RenderConfig(width=8, height=8),
            guide_resolution=16)
        st_g = pstep.full_trace_step(scene, pstep.init_state(scene, cfg),
                                     cfg)
        st_u = st_g

        guide = None
        for _ in range(3):
            st_g, guide = pstep.progressive_step_guided(scene, st_g, cfg,
                                                        guide=guide)
        for _ in range(3):
            st_u = pstep.progressive_step(scene, st_u, cfg)

        g = np.asarray(guide)
        assert g.max() > 0
        # The blob only covers part of the plane: contribution concentrates.
        assert 0 < (g > 0.5 * g.max()).mean() < 0.5

        tot_g = float(jnp.sum(st_g.light_volume_accum))
        tot_u = float(jnp.sum(st_u.light_volume_accum))
        assert abs(tot_g - tot_u) / max(tot_u, 1e-9) < 0.2
        assert int(st_g.photons.iteration) == 3
