"""Time-varying playback: correlated selective recomputation vs full
retrace, drain-mask reset on new time steps, and equal-importance rotation.

This is the paper's headline scenario (BASELINE config 4): reference chain
dynamicvolumedifferenceanalysis.cpp:60-104 ->
minmaxuniformgrid3dimportance.cl:291-330 ->
photonrecomputationdetector.cl:160-194."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import (PipelineConfig, RecomputeConfig,
                                 RenderConfig, SplatConfig, TracerConfig)
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, UniformGrid3D, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import path_importance
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.pipeline import timevarying as tv

DIM = 48
STEPS = 24


@pytest.fixture(scope="module")
def seq():
    return tv.VolumeSequence.prepare(
        synthetic.time_varying_sequence(DIM, STEPS), cell_size=8)


@pytest.fixture(scope="module")
def setup(seq):
    volume = Volume.from_data(np.asarray(seq.volumes[0]))
    # Opacity steps from 0 straight to 0.5: the reference's
    # power /= max(opacity, 0.01) estimator (photontracer.cl:176) amplifies
    # collisions in near-zero-opacity regions up to 100x, and with only 1k
    # photons a handful of such outliers would dominate the light volume
    # and swamp the correlated-vs-full comparison with estimator variance.
    tf = TransferFunction.from_points(
        jnp.array([0.0, 0.3, 0.32, 1.0]),
        jnp.array([[0.2, 0.2, 0.2, 0.0], [0.2, 0.2, 0.2, 0.0],
                   [0.9, 0.8, 0.7, 0.5], [1.0, 1.0, 1.0, 0.8]]))
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(volume, tf, tfs,
                         [Light.directional((0.0, -1.0, 0.3))],
                         Camera.create())
    config = PipelineConfig(
        photons_x=32, photons_y=32,
        tracer=TracerConfig(max_interactions=2, max_steps=1500,
                            use_compaction=False),
        recompute=RecomputeConfig(max_photons_fraction=1.0),
        splat=SplatConfig(volume_size_from_radius=False, volume_dim=16),
        render=RenderConfig(width=24, height=24))
    state = pstep.full_trace_step(scene, pstep.init_state(scene, config),
                                  config)
    return scene, state, config


def _rel_l1(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).sum() / (np.abs(b).sum() + 1e-12)


class TestCorrelatedPlayback:
    def test_tracks_full_retrace_exactly(self, seq, setup):
        """When the per-frame budget covers the flagged set, correlated
        playback must reproduce the full retrace light volume (<0.1% rel-L1
        per step — unflagged photons keep bit-identical RNG trajectories,
        flagged ones are retraced with their original lane streams), while a
        frozen map drifts by >100% per step; AND the flagged set must be a
        strict subset (<85%) of the photons — selective, not a full
        retrace in disguise."""
        scene, state, config = setup
        scene_c, st_c = scene, state
        stale_lv = np.asarray(state.light_volume)
        for t in range(1, 5):
            scene_c, st_c = tv.advance_time(scene_c, st_c, seq, float(t),
                                            config)
            scene_f = scene.replace(volume=scene.volume.replace(
                data=seq.volumes[t]))
            st_f = pstep.full_trace_step(scene_f, state, config)
            err_corr = _rel_l1(st_c.light_volume, st_f.light_volume)
            err_stale = _rel_l1(stale_lv, st_f.light_volume)
            assert err_corr < 1e-3, (t, err_corr)
            assert err_stale > 1.0, (t, err_stale)
        ig = tv.time_step_importance(
            seq.minmax, seq.diff, jnp.float32(1.0), scene.tf.positions,
            scene.tf.colors, seq.volumes.shape[1:], seq.cell_size,
            tv.importance_mod.ImportanceWeights().normalized())
        imp = pstep.recompute_importance(config, ig, state.photons,
                                         state.light_samples)
        frac = float((np.asarray(imp) > 0).mean())
        assert 0.05 < frac < 0.85, frac

    def test_undersized_budget_still_tracks_better_than_stale(self, seq,
                                                              setup):
        """With a 40% budget (smaller than the ~76% flagged set) the
        correlated map cannot be exact, but in aggregate it must track the
        full retrace better than a frozen map (per-step comparisons are
        dominated by the 1k-photon estimator variance)."""
        scene, state, config = setup
        from dataclasses import replace as dc_replace
        cfg = dc_replace(config,
                         recompute=RecomputeConfig(max_photons_fraction=0.4))
        scene_c, st_c = scene, state
        stale_lv = np.asarray(state.light_volume)
        ec, es = [], []
        for t in range(1, 5):
            scene_c, st_c = tv.advance_time(scene_c, st_c, seq, float(t),
                                            cfg)
            scene_f = scene.replace(volume=scene.volume.replace(
                data=seq.volumes[t]))
            st_f = pstep.full_trace_step(scene_f, state, cfg)
            ec.append(_rel_l1(st_c.light_volume, st_f.light_volume))
            es.append(_rel_l1(stale_lv, st_f.light_volume))
        assert np.mean(ec) < np.mean(es), (ec, es)

    def test_full_budget_full_change_bit_matches_full_retrace(self, seq,
                                                              setup):
        """When every photon is flagged (all-ones importance) and the budget
        covers the whole buffer, the correlated step must reproduce the full
        retrace bit-for-bit (same RNG streams via lane_ids)."""
        scene, state, config = setup
        vol1 = seq.volumes[3]
        scene2 = scene.replace(volume=scene.volume.replace(data=vol1))
        gdim = (DIM // 8,) * 3
        ones = UniformGrid3D(
            data=jnp.ones(gdim, jnp.float32),
            cell_dim=jnp.array([8.0] * 3),
            volume_dim=jnp.array([float(DIM)] * 3))
        st_c = pstep.correlated_step(scene2, state, config, ones,
                                     budget=state.photons.n)
        st_f = pstep.full_trace_step(scene2, state, config)
        np.testing.assert_array_equal(np.asarray(st_c.photons.positions),
                                      np.asarray(st_f.photons.positions))
        np.testing.assert_allclose(np.asarray(st_c.light_volume),
                                   np.asarray(st_f.light_volume),
                                   rtol=2e-5, atol=1e-7)


class TestDrainReset:
    def test_new_time_step_resets_drain_mask(self, seq, setup):
        """A poisoned all-True retraced mask (stale unfinished drain) must
        not suppress selection on the next time step."""
        scene, state, config = setup
        poisoned = state.replace(
            retraced=jnp.ones_like(state.retraced),
            n_remaining=jnp.int32(state.photons.n))
        _, st2 = tv.advance_time(scene, poisoned, seq, 2.0, config)
        # if the mask had survived, nothing would be selected and the light
        # volume would be carried over unchanged
        assert _rel_l1(st2.light_volume, state.light_volume) > 1e-3
        assert int(jnp.sum(st2.retraced)) < state.photons.n


class TestEqualImportanceRotation:
    def test_phase_advances_per_step(self, seq, setup):
        scene, state, config = setup
        cfg = PipelineConfig(
            photons_x=config.photons_x, photons_y=config.photons_y,
            tracer=config.tracer, splat=config.splat, render=config.render,
            recompute=RecomputeConfig(max_photons_fraction=0.05,
                                      equal_importance=True,
                                      equal_importance_percentage=5))
        gdim = (DIM // 8,) * 3
        ones = UniformGrid3D(
            data=jnp.ones(gdim, jnp.float32),
            cell_dim=jnp.array([8.0] * 3),
            volume_dim=jnp.array([float(DIM)] * 3))
        budget = pstep.recompute_budget(cfg, state.photons.n)
        st = state
        assert int(st.recompute_phase) == 0
        st = pstep.correlated_step(scene, st, cfg, ones, budget)
        assert int(st.recompute_phase) == 1
        st = pstep.correlated_step(scene, st, cfg, ones, budget)
        assert int(st.recompute_phase) == 2

    def test_rotation_covers_all_photons(self):
        """Successive phases select disjoint round-robin sets whose union
        covers every photon over one period
        (photonrecomputationdetector.cl:160-194)."""
        n, pct = 64, 10
        period = 100 // pct
        sets = []
        for phase in range(period):
            imp = path_importance.equal_importance(
                n, jnp.int32(phase), pct)
            sets.append(set(np.nonzero(np.asarray(imp) > 0)[0].tolist()))
        union = set().union(*sets)
        assert union == set(range(n))
        for a in range(period):
            for b in range(a + 1, period):
                assert not (sets[a] & sets[b])
