"""Importance machinery: min/max grids, TF classification, DDA path
integration vs numpy oracle, photon selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core.types import (LightSamples, PhotonData, UniformGrid3D,
                                Volume, encode_direction)
from cpm_tpu.ops import diffanalysis, importance, minmax, mixer
from cpm_tpu.ops import path_importance as pimp
from cpm_tpu.ops import select
from cpm_tpu.oracle.reference import dda_integral_oracle


class TestMinMax:
    def test_constant_volume(self):
        vol = Volume.from_data(np.full((16, 16, 16), 0.5, np.float32))
        grid = minmax.volume_min_max(vol, cell_size=8)
        assert grid.data.shape == (2, 2, 2, 2)
        np.testing.assert_allclose(np.asarray(grid.data), 0.5)

    def test_matches_numpy_blocks(self):
        rng = np.random.default_rng(3)
        data = rng.random((16, 24, 8)).astype(np.float32)
        vol = Volume.from_data(data)
        grid = np.asarray(minmax.volume_min_max(vol, cell_size=8).data)
        assert grid.shape == (2, 3, 1, 2)
        for z in range(2):
            for y in range(3):
                blk = data[z*8:(z+1)*8, y*8:(y+1)*8, :]
                assert grid[z, y, 0, 0] == pytest.approx(blk.min())
                assert grid[z, y, 0, 1] == pytest.approx(blk.max())

    def test_partial_border_cells(self):
        data = np.zeros((10, 10, 10), np.float32)
        data[9, 9, 9] = 1.0
        vol = Volume.from_data(data)
        grid = np.asarray(minmax.volume_min_max(vol, cell_size=8).data)
        assert grid.shape == (2, 2, 2, 2)
        assert grid[1, 1, 1, 1] == 1.0

    def test_sequence(self):
        seq = np.stack([np.full((8, 8, 8), v, np.float32)
                        for v in (0.1, 0.9)])
        grids = np.asarray(minmax.sequence_min_max(jnp.asarray(seq), 8))
        assert grids.shape == (2, 1, 1, 1, 2)
        np.testing.assert_allclose(grids[0], 0.1)
        np.testing.assert_allclose(grids[1], 0.9)


class TestTFImportance:
    def _tf(self):
        positions = jnp.array([0.0, 0.3, 0.6, 1.0], jnp.float32)
        colors = jnp.array([[0, 0, 0, 0], [1, 0, 0, 0.5],
                            [0, 1, 0, 0.0], [0, 0, 1, 1.0]], jnp.float32)
        return positions, colors

    def test_transparent_range_zero_importance(self):
        positions = jnp.array([0.0, 1.0], jnp.float32)
        colors = jnp.zeros((2, 4), jnp.float32)
        w = importance.ImportanceWeights().normalized()
        mm = jnp.array([[[[0.1, 0.9]]]], jnp.float32)
        imp = importance.classify_importance(mm, positions, colors, w)
        assert float(imp[0, 0, 0]) == 0.0

    def test_opaque_range_positive(self):
        positions, colors = self._tf()
        w = importance.ImportanceWeights().normalized()
        mm = jnp.array([[[[0.2, 0.8]]]], jnp.float32)
        imp = importance.classify_importance(mm, positions, colors, w)
        assert float(imp[0, 0, 0]) > 0.0

    def test_narrow_range_less_important_than_wide(self):
        positions, colors = self._tf()
        w = importance.ImportanceWeights().normalized()
        mm = jnp.array([[[[0.28, 0.32]]], [[[0.0, 1.0]]]], jnp.float32)
        imp = importance.classify_importance(mm, positions, colors, w)
        assert float(imp[1, 0, 0]) > float(imp[0, 0, 0])

    def test_envelope_includes_interior_points(self):
        # Range straddling the pure-red control point must see red
        positions, colors = self._tf()
        cmin, cmax = importance.color_envelope(
            positions, colors, jnp.array([0.25]), jnp.array([0.35]))
        assert float(cmax[0, 0]) == pytest.approx(1.0, abs=1e-5)

    def test_time_varying_scaled_by_diff(self):
        positions, colors = self._tf()
        w = importance.ImportanceWeights().normalized()
        mm = jnp.array([[[[0.2, 0.8]]]], jnp.float32)
        static = importance.classify_importance(mm, positions, colors, w)
        tv = importance.classify_time_varying_importance(
            mm, mm, jnp.array([[[0.5]]], jnp.float32), positions, colors, w)
        np.testing.assert_allclose(np.asarray(tv), 0.5 * np.asarray(static),
                                   rtol=1e-5)

    def test_tf_difference_points(self):
        pa = [0.0, 0.5, 1.0]
        ca = [(0, 0, 0, 0), (1, 0, 0, 0.5), (0, 0, 0, 0)]
        pos, diff = importance.tf_difference_points(pa, ca, pa, ca)
        assert np.all(diff == 0.0)
        cb = [(0, 0, 0, 0), (0, 0, 0, 0), (0, 0, 0, 0)]
        pos, diff = importance.tf_difference_points(pa, ca, pa, cb)
        assert diff[1, 0] == pytest.approx(1.0)
        assert diff[1, 3] == pytest.approx(0.5)

    def test_rgb2lab_white(self):
        lab = np.asarray(importance.rgb2lab(jnp.array([1.0, 1.0, 1.0])))
        np.testing.assert_allclose(lab, [100.0, 0.0, 0.0], atol=0.2)


class TestDDA:
    def test_matches_oracle_random_segments(self):
        rng = np.random.default_rng(7)
        grid = rng.random((4, 4, 4)).astype(np.float32)
        cell_dim = np.array([4.0, 4.0, 4.0])
        x1 = rng.uniform(0.5, 15.5, (20, 3)).astype(np.float32)
        x2 = rng.uniform(0.5, 15.5, (20, 3)).astype(np.float32)
        ours = np.asarray(pimp.grid_segment_integral(
            jnp.asarray(grid), jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(cell_dim, jnp.float32), max_steps=32))
        for i in range(20):
            ref = dda_integral_oracle(grid, x1[i].astype(np.float64),
                                      x2[i].astype(np.float64), cell_dim)
            assert ours[i] == pytest.approx(ref, rel=1e-3, abs=1e-4)

    def test_uniform_grid_gives_length(self):
        # Integral of a constant-1 grid = segment length
        grid = jnp.ones((4, 4, 4), jnp.float32)
        x1 = jnp.array([[1.0, 1.0, 1.0]])
        x2 = jnp.array([[13.0, 9.0, 5.0]])
        out = pimp.grid_segment_integral(
            grid, x1, x2, jnp.array([4.0, 4.0, 4.0]), max_steps=16)
        expected = np.linalg.norm([12.0, 8.0, 4.0])
        assert float(out[0]) == pytest.approx(expected, rel=1e-4)


class TestPathImportance:
    def _scene(self, n=8):
        # Importance concentrated in one octant
        g = np.zeros((2, 2, 2), np.float32)
        g[0, 0, 0] = 1.0  # low-x/y/z octant
        grid = UniformGrid3D(data=jnp.asarray(g),
                             cell_dim=jnp.array([8.0, 8.0, 8.0]),
                             volume_dim=jnp.array([16.0, 16.0, 16.0]))
        origins = np.tile(np.array([[0.25, 0.25, 0.0]], np.float32), (n, 1))
        origins[n // 2:] = [0.75, 0.75, 0.0]  # these miss the hot octant
        dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
        ls = LightSamples(origins=jnp.asarray(origins),
                          directions=jnp.asarray(dirs),
                          powers=jnp.ones((n, 3), jnp.float32),
                          tspan=jnp.tile(jnp.array([[0.0, 1.0]]), (n, 1)),
                          iteration=jnp.int32(0))
        return grid, ls

    def test_paths_through_hot_region_ranked_higher(self):
        n = 8
        grid, ls = self._scene(n)
        photons = PhotonData.create(n, 1)  # no interactions: straight rays
        imp = np.asarray(pimp.photon_path_importance(grid, photons, ls))
        assert np.all(imp[:n // 2] > 0.0)
        # straight-through rays in the cold corner: importance 0
        np.testing.assert_allclose(imp[n // 2:], 0.0, atol=1e-6)

    def test_absorbed_photon_path_stops(self):
        n = 4
        grid, ls = self._scene(n)
        photons = PhotonData.create(n, 2)
        # Photon 0: absorbed at z=0.25 in the cold->hot boundary
        pos = np.asarray(photons.positions).copy()
        pos[0, 0] = [0.25, 0.25, 0.25]
        photons = photons.replace(positions=jnp.asarray(pos))
        # exit_power FLT_MAX (default from create) means absorbed
        imp = np.asarray(pimp.photon_path_importance(grid, photons, ls))
        # Path 0 = only entry->interaction segment (length 0.25 through hot)
        full = np.asarray(pimp.photon_path_importance(
            grid, PhotonData.create(n, 2), ls))
        assert 0 < imp[0] < full[0]

    def test_equal_importance_period(self):
        imp = np.asarray(pimp.equal_importance(100, jnp.int32(0), 10))
        assert imp.sum() == pytest.approx(10)
        imp2 = np.asarray(pimp.equal_importance(100, jnp.int32(1), 10))
        assert imp2.sum() == pytest.approx(10)
        assert not np.array_equal(imp, imp2)


class TestSelect:
    def test_top_budget_selected(self):
        imp = jnp.array([0.0, 5.0, 1.0, 0.0, 3.0, 2.0, 0.0, 4.0])
        idx, valid, rem = select.select_photons_to_recompute(
            imp, budget=3, spatial_sort=False)
        assert set(np.asarray(idx)[np.asarray(valid)].tolist()) == {1, 7, 4}
        assert int(rem) == 2

    def test_budget_exceeds_flagged(self):
        imp = jnp.array([0.0, 1.0, 0.0, 0.0])
        idx, valid, rem = select.select_photons_to_recompute(
            imp, budget=3, spatial_sort=False)
        assert int(np.asarray(valid).sum()) == 1
        assert int(idx[0]) == 1
        assert int(rem) == 0

    def test_spatial_sort_ascending(self):
        imp = jnp.array([0.0, 5.0, 1.0, 0.0, 3.0, 2.0, 0.0, 4.0])
        idx, valid, _ = select.select_photons_to_recompute(
            imp, budget=3, spatial_sort=True)
        sel = np.asarray(idx)[np.asarray(valid)]
        assert np.all(np.diff(sel) > 0)

    def test_progressive_drain_exclude(self):
        """The drain excludes already-retraced photons (the analog of
        resetPhotonImportance, progressivephotontracercl.cpp:607-611): with
        the top-3 masked out, the next batch picks the next priorities."""
        imp = jnp.array([0.0, 5.0, 1.0, 0.0, 3.0, 2.0, 0.0, 4.0])
        done = jnp.array([False, True, False, False, True, False, False, True])
        idx, valid, rem = select.select_photons_to_recompute(
            imp, budget=3, exclude=done, spatial_sort=False)
        # remaining flagged: photons 5 (imp 2) and 2 (imp 1)
        sel = np.asarray(idx)[np.asarray(valid)].tolist()
        assert sel == [5, 2]
        assert int(rem) == 0


class TestMixerAndDiff:
    def test_mix(self):
        a = jnp.zeros((4, 4))
        b = jnp.ones((4, 4))
        np.testing.assert_allclose(np.asarray(mixer.mix(a, b, 0.25)), 0.25)

    def test_sequence_sample_wraps(self):
        seq = jnp.stack([jnp.full((2, 2), float(i)) for i in range(4)])
        v = mixer.sequence_sample(seq, jnp.float32(3.5))
        np.testing.assert_allclose(np.asarray(v), 1.5)  # mix(seq[3], seq[0])

    def test_difference_grids(self):
        seq = np.stack([np.zeros((8, 8, 8)), np.full((8, 8, 8), 0.5)]
                       ).astype(np.float32)
        grids = np.asarray(diffanalysis.volume_difference_grids(
            jnp.asarray(seq), cell_size=8))
        assert grids.shape == (2, 1, 1, 1)
        np.testing.assert_allclose(grids[0], 0.5)  # |t1 - t0|
        np.testing.assert_allclose(grids[1], 0.5)  # cyclic |t0 - t1|


def test_quadrature_mxu_matches_gather():
    """The one-hot MXU quadrature is the SAME estimator as the gather
    quadrature — exact per-sample lookups (one nonzero product each), so
    the two modes must agree to float precision on any segment set."""
    import jax

    from cpm_tpu.ops import path_importance as pi

    key = jax.random.PRNGKey(0)
    grid = jax.random.uniform(key, (7, 5, 6))
    m = 503
    x1 = jax.random.uniform(jax.random.fold_in(key, 1), (m, 3)) * 40.0
    x2 = jax.random.uniform(jax.random.fold_in(key, 2), (m, 3)) * 40.0
    cell = jnp.array([8.0, 8.0, 8.0])
    a = pi.grid_segment_integral_quadrature(grid, x1, x2, cell, 8)
    b = pi.grid_segment_integral_quadrature_mxu(grid, x1, x2, cell, 8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-7)
