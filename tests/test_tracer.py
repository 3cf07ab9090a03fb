"""Wavefront photon tracer: free-flight statistics, power bookkeeping,
sentinel structure, determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core import constants
from cpm_tpu.core.config import TracerConfig
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.core.lights import Light
from cpm_tpu.ops import emit, sampling, tracer


def _homogeneous_scene(opacity=0.5, albedo=0.9, dim=16):
    vol = Volume.from_data(np.ones((dim, dim, dim), np.float32))
    tf = TransferFunction.from_points(
        [0.0, 1.0], [(1, 1, 1, opacity), (1, 1, 1, opacity)])
    scat_w = opacity * albedo / (1.0 - albedo)
    tf_s = TransferFunction.from_points(
        [0.0, 1.0], [(1, 1, 1, scat_w), (1, 1, 1, scat_w)])
    return vol, tf, tf_s


def _trace(n=4096, opacity=0.5, albedo=0.9, max_i=1, seed=0, **kw):
    vol, tf, tf_s = _homogeneous_scene(opacity, albedo)
    grid = sampling.stratified_grid_2d(int(np.sqrt(n)), int(np.sqrt(n)))
    light = Light.directional([0.0, 0.0, 1.0])
    ls = emit.emit(light, grid)
    cfg = TracerConfig(max_interactions=max_i, **kw)
    photons = tracer.trace_photons(vol, tf, tf_s, ls,
                                   jax.random.PRNGKey(seed), cfg)
    return photons, ls


class TestFreeFlight:
    def test_interaction_fraction_matches_beer_lambert(self):
        # P(interact before exiting depth L) = 1 - exp(-sigma*L)
        opacity = 0.3
        photons, _ = _trace(n=16384, opacity=opacity)
        interacted = np.asarray(photons.positions[0, :, 0]) < 1e30
        sigma = opacity * constants.SAMPLING_BASE_INTERVAL_RCP
        expected = 1.0 - np.exp(-sigma * 1.0)  # unit depth box
        assert interacted.mean() == pytest.approx(expected, abs=0.02)

    def test_first_interaction_depth_distribution(self):
        opacity = 0.2
        photons, ls = _trace(n=16384, opacity=opacity)
        pos = np.asarray(photons.positions[0])
        ok = pos[:, 0] < 1e30
        depth = pos[ok, 2]  # light travels +z from z=0 face
        sigma = opacity * constants.SAMPLING_BASE_INTERVAL_RCP
        # truncated exponential mean on [0, 1]
        expected_mean = 1.0 / sigma - np.exp(-sigma) / (1 - np.exp(-sigma))
        assert depth.mean() == pytest.approx(expected_mean, rel=0.05)


class TestPowerBookkeeping:
    def test_absorbed_photon_power(self):
        # With albedo ~ 0 every interacting photon is absorbed; stored power
        # = power0 / maxI / max(opacity, 0.01) (photontracer.cl:150,176)
        opacity = 0.5
        photons, ls = _trace(n=1024, opacity=opacity, albedo=1e-6)
        pow0 = np.asarray(ls.powers)
        stored = np.asarray(photons.powers[0])
        ok = np.asarray(photons.positions[0, :, 0]) < 1e30
        assert ok.sum() > 100
        np.testing.assert_allclose(stored[ok], pow0[ok] / max(opacity, 0.01),
                                   rtol=1e-4)
        # Absorbed -> exit power sentinel FLT_MAX
        assert np.all(np.asarray(photons.exit_power)[ok] > 1e30)

    def test_scattered_photon_power_includes_albedo(self):
        opacity, albedo = 0.5, 0.7
        photons, ls = _trace(n=4096, opacity=opacity, albedo=albedo, max_i=4)
        pow0 = np.asarray(ls.powers) / 4.0
        stored = np.asarray(photons.powers[0])
        n_int = (np.asarray(photons.positions[:, :, 0]) < 1e30).sum(0)
        # Photons whose FIRST interaction scattered (they have >= 2)
        multi = n_int >= 2
        expected = pow0[multi] / max(opacity, 0.01) * albedo
        np.testing.assert_allclose(stored[multi], expected, rtol=2e-4)

    def test_max_interactions_bounds_path(self):
        photons, _ = _trace(n=1024, opacity=0.8, albedo=0.98, max_i=3)
        n_int = (np.asarray(photons.positions[:, :, 0]) < 1e30).sum(0)
        assert n_int.max() <= 3


class TestStructure:
    def test_sentinels_above_interaction_count(self):
        photons, _ = _trace(n=1024, opacity=0.4, albedo=0.6, max_i=4)
        pos = np.asarray(photons.positions[:, :, 0])
        filled = pos < 1e30
        # No gaps: row i filled implies all rows < i filled
        counts = filled.sum(0)
        for i in range(4):
            assert np.all(filled[i] == (counts > i))

    def test_interactions_inside_box(self):
        photons, _ = _trace(n=4096, opacity=0.5, albedo=0.9, max_i=4)
        pos = np.asarray(photons.positions)
        ok = pos[..., 0] < 1e30
        inside = np.all((pos >= -1e-4) & (pos <= 1 + 1e-4), axis=-1)
        assert np.all(inside[ok])

    def test_stored_direction_is_incoming(self):
        # With maxI=1 every interaction stores the initial light direction.
        photons, ls = _trace(n=1024, opacity=0.5)
        ok = np.asarray(photons.positions[0, :, 0]) < 1e30
        from cpm_tpu.core.types import decode_direction
        d = np.asarray(decode_direction(photons.directions[0]))
        np.testing.assert_allclose(d[ok], np.asarray(ls.directions)[ok],
                                   atol=1e-4)


class TestDeterminism:
    def test_same_seed_bit_identical(self):
        p1, _ = _trace(n=1024, seed=7)
        p2, _ = _trace(n=1024, seed=7)
        assert np.array_equal(np.asarray(p1.positions), np.asarray(p2.positions))
        assert np.array_equal(np.asarray(p1.powers), np.asarray(p2.powers))

    def test_different_seed_differs(self):
        p1, _ = _trace(n=1024, seed=1)
        p2, _ = _trace(n=1024, seed=2)
        assert not np.array_equal(np.asarray(p1.positions),
                                  np.asarray(p2.positions))


class TestRecomputeMerge:
    def test_merge_scatters_subset(self):
        p1, _ = _trace(n=256, seed=1, opacity=0.5, albedo=0.6, max_i=2)
        p2, _ = _trace(n=256, seed=2, opacity=0.5, albedo=0.6, max_i=2)
        idx = jnp.array([3, 10, 200], jnp.int32)
        valid = jnp.array([True, True, False])
        sub = jax.tree.map(
            lambda a: a if a.ndim == 0 else
            (a[:, idx] if a.ndim >= 2 and a.shape[1] == 256 else a[idx]),
            p2)
        merged = tracer.merge_recomputed(p1, sub, idx, valid)
        m = np.asarray(merged.positions)
        np.testing.assert_array_equal(m[:, 3], np.asarray(p2.positions)[:, 3])
        np.testing.assert_array_equal(m[:, 10], np.asarray(p2.positions)[:, 10])
        # invalid lane 200 keeps original
        np.testing.assert_array_equal(m[:, 200],
                                      np.asarray(p1.positions)[:, 200])


class TestNoSingleScattering:
    def test_first_interaction_not_deposited(self):
        """Under no_single_scattering the first interaction scatters without
        being stored (photontracer.cl:143-157): with maxI=1, stored photons
        can only come from the SECOND collision, so they lie off the
        original ray line and are strictly fewer than in the default mode."""
        vol, tf, tf_s = _homogeneous_scene(0.5, 0.9)
        grid = sampling.stratified_grid_2d(64, 64)
        light = Light.directional([0.0, 0.0, 1.0])
        ls = emit.emit(light, grid)
        base = TracerConfig(max_interactions=1)
        nss = TracerConfig(max_interactions=1, no_single_scattering=True)
        key = jax.random.PRNGKey(0)
        p_base = tracer.trace_photons(vol, tf, tf_s, ls, key, base)
        p_nss = tracer.trace_photons(vol, tf, tf_s, ls, key, nss)

        stored_base = np.asarray(p_base.positions[0, :, 0]) < 1e30
        stored_nss = np.asarray(p_nss.positions[0, :, 0]) < 1e30
        assert 0 < stored_nss.sum() < stored_base.sum()

        # Default mode: first deposit sits ON the original ray (x,y match
        # the emission point). NSS mode: deposits come after one scatter,
        # so most leave the ray line.
        origins = np.asarray(ls.origins)
        pos_nss = np.asarray(p_nss.positions[0])
        off_ray = (np.abs(pos_nss[stored_nss, :2]
                          - origins[stored_nss, :2]).max(axis=1) > 1e-4)
        assert off_ray.mean() > 0.9

    def test_default_mode_unchanged(self):
        """no_single_scattering=False is the exact default path."""
        vol, tf, tf_s = _homogeneous_scene(0.5, 0.9)
        grid = sampling.stratified_grid_2d(32, 32)
        ls = emit.emit(Light.directional([0.0, 0.0, 1.0]), grid)
        key = jax.random.PRNGKey(0)
        a = tracer.trace_photons(vol, tf, tf_s, ls, key,
                                 TracerConfig(max_interactions=2))
        b = tracer.trace_photons(
            vol, tf, tf_s, ls, key,
            TracerConfig(max_interactions=2, no_single_scattering=False))
        np.testing.assert_array_equal(np.asarray(a.positions),
                                      np.asarray(b.positions))
