"""Majorant macrocell grid: range-max table, conservativeness, cell exit."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.ops import majorant, sampling


def _tf():
    return TransferFunction.from_points(
        [0.0, 0.3, 0.5, 1.0],
        [(0, 0, 0, 0.0), (1, 0, 0, 0.0), (0, 1, 0, 0.9), (0, 0, 1, 0.1)])


class TestRangeMaxTable:
    def test_matches_bruteforce(self):
        op = jnp.asarray(np.random.RandomState(0).rand(64).astype(np.float32))
        table = np.asarray(majorant.opacity_range_max_table(op))
        opn = np.asarray(op)
        for i in range(0, 64, 7):
            for j in range(i, 64, 5):
                assert table[i, j] == opn[i:j + 1].max()


class TestMajorantGrid:
    def test_bounds_all_interpolated_samples(self):
        """For random positions, TF(trilinear(volume, p)).opacity must never
        exceed the majorant of the macrocell containing p."""
        rs = np.random.RandomState(1)
        vol = Volume.from_data(rs.rand(32, 32, 32).astype(np.float32))
        tf = _tf()
        maj = majorant.build_majorant_grid(vol, tf, cell_size=8)
        gz, gy, gx = maj.shape
        assert (gz, gy, gx) == (4, 4, 4)

        p = jnp.asarray(rs.rand(20000, 3).astype(np.float32))
        v = sampling.sample_volume_trilinear(vol.data, p)
        opac = np.asarray(tf.sample(v)[:, 3])
        cell = np.clip((np.asarray(p) * 4).astype(int), 0, 3)
        m = np.asarray(maj)[cell[:, 2], cell[:, 1], cell[:, 0]]
        assert (opac <= m + 1e-6).all()

    def test_empty_volume_is_all_zero(self):
        vol = Volume.from_data(np.zeros((16, 16, 16), np.float32))
        tf = _tf()  # opacity 0 at data value 0
        maj = np.asarray(majorant.build_majorant_grid(vol, tf, cell_size=8))
        assert (maj <= 1e-6).all()

    def test_homogeneous_tight(self):
        vol = Volume.from_data(np.full((16, 16, 16), 0.5, np.float32))
        tf = TransferFunction.from_points(
            [0.0, 1.0], [(1, 1, 1, 0.4), (1, 1, 1, 0.4)])
        maj = np.asarray(majorant.build_majorant_grid(vol, tf, cell_size=8))
        np.testing.assert_allclose(maj, 0.4, rtol=1e-5)


class TestCellExit:
    def test_exit_distance(self):
        o = jnp.array([[0.1, 0.5, 0.5]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        cell = jnp.array([[0, 2, 2]], jnp.int32)
        g = jnp.array([4.0, 4.0, 4.0])
        t = float(majorant.cell_exit_distance(o, d, cell, g)[0])
        assert abs(t - 0.15) < 1e-6  # exits at x = 0.25

    def test_negative_direction(self):
        o = jnp.array([[0.3, 0.5, 0.5]])
        d = jnp.array([[-1.0, 0.0, 0.0]])
        cell = jnp.array([[1, 2, 2]], jnp.int32)
        g = jnp.array([4.0, 4.0, 4.0])
        t = float(majorant.cell_exit_distance(o, d, cell, g)[0])
        assert abs(t - 0.05) < 1e-6  # exits at x = 0.25

    def test_point_on_exit_is_in_next_cell(self):
        """pos + (t_exit + eps) * dir lands in the adjacent cell."""
        rs = np.random.RandomState(2)
        o = jnp.asarray(rs.rand(512, 3).astype(np.float32))
        d = rs.randn(512, 3).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
        g = jnp.array([8.0, 8.0, 8.0])
        cell = jnp.clip(jnp.floor(o * g), 0, 7).astype(jnp.int32)
        t = majorant.cell_exit_distance(o, d, cell, g)
        p2 = o + (t + 1e-5)[:, None] * d
        cell2 = np.clip(np.floor(np.asarray(p2) * 8), 0, 7)
        moved = (cell2 != np.asarray(cell)).any(axis=-1)
        inside = (np.asarray(p2) > 0).all(-1) & (np.asarray(p2) < 1).all(-1)
        assert moved[inside].all()
