"""Splatting: allclose vs the numpy oracle port of splatPhoton, energy
conservation, determinism, incremental ±1 updates."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core import constants
from cpm_tpu.core.types import PhotonData, relative_irradiance_scale
from cpm_tpu.ops import splat
from cpm_tpu.oracle.reference import splat_oracle


def _make_photons(n=64, max_i=2, seed=0, radius=0.08):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.05, 0.95, (max_i, n, 3)).astype(np.float32)
    pow_ = rng.uniform(0.1, 2.0, (max_i, n, 3)).astype(np.float32)
    # Make some sentinel slots
    mask = rng.random((max_i, n)) < 0.3
    pos[mask] = constants.FLT_MAX
    return PhotonData(
        positions=jnp.asarray(pos), powers=jnp.asarray(pow_),
        directions=jnp.zeros((max_i, n, 2), jnp.float32),
        exit_power=jnp.zeros(n, jnp.float32),
        exit_direction=jnp.zeros((n, 2), jnp.float32),
        radius_rel=jnp.float32(radius),
        scene_radius=jnp.float32(np.sqrt(3.0)),
        iteration=jnp.int32(0),
    ), pos, pow_


class TestSplatVsOracle:
    def test_matches_reference_port(self):
        photons, pos, pow_ = _make_photons(n=48, max_i=2, radius=0.09)
        dim = (16, 16, 16)
        ours = np.asarray(splat.splat_all(photons, dim, footprint=5))
        scale = float(constants.ISOTROPIC_PHASE
                      * relative_irradiance_scale(48, photons.radius_rel))
        flat_pos = pos.reshape(-1, 3)
        flat_pow = pow_.reshape(-1, 3)
        valid = flat_pos[:, 0] < 1e30
        ref = splat_oracle(flat_pos, flat_pow, valid, 0.09, scale, dim)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-7)

    def test_footprint_covers_radius(self):
        # radius 0.09 * dim 16 = 1.44 voxels -> AABB spans <= 4 cells/axis;
        # footprint 4 and 6 must agree
        photons, _, _ = _make_photons(n=32, radius=0.09)
        dim = (16, 16, 16)
        a = np.asarray(splat.splat_all(photons, dim, footprint=4))
        b = np.asarray(splat.splat_all(photons, dim, footprint=6))
        # atol: scatter-add accumulation order differs with footprint size
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestSplatProperties:
    def test_deterministic(self):
        photons, _, _ = _make_photons(n=128)
        dim = (12, 12, 12)
        a = np.asarray(splat.splat_all(photons, dim))
        b = np.asarray(splat.splat_all(photons, dim))
        assert np.array_equal(a, b)

    def test_sentinels_contribute_nothing(self):
        photons = PhotonData.create(16, 2)  # all sentinels
        grid = np.asarray(splat.splat_all(photons, (8, 8, 8)))
        assert np.all(grid == 0.0)

    def test_single_photon_center_mass(self):
        n = 4
        pos = np.full((1, n, 3), constants.FLT_MAX, np.float32)
        pow_ = np.zeros((1, n, 3), np.float32)
        pos[0, 0] = [0.5, 0.5, 0.5]
        pow_[0, 0] = [1.0, 2.0, 3.0]
        photons = PhotonData(
            positions=jnp.asarray(pos), powers=jnp.asarray(pow_),
            directions=jnp.zeros((1, n, 2), jnp.float32),
            exit_power=jnp.zeros(n), exit_direction=jnp.zeros((n, 2)),
            radius_rel=jnp.float32(0.2), scene_radius=jnp.float32(1.0),
            iteration=jnp.int32(0))
        grid = np.asarray(splat.splat_all(photons, (10, 10, 10), footprint=6))
        total = grid.sum(axis=(0, 1, 2))
        # Energy proportional to power ratio across channels
        np.testing.assert_allclose(total / total[0], [1.0, 2.0, 3.0],
                                   rtol=1e-5)
        # Peak at the center voxel
        peak = np.unravel_index(grid[..., 0].argmax(), grid[..., 0].shape)
        assert peak == (5, 5, 5) or grid[..., 0][peak] == pytest.approx(
            grid[4, 4, 4, 0], rel=0.5)


class TestSplatSelected:
    def test_remove_add_roundtrip(self):
        photons, _, _ = _make_photons(n=64, max_i=2)
        dim = (12, 12, 12)
        full = np.asarray(splat.splat_all(photons, dim))
        idx = jnp.arange(10, dtype=jnp.int32)
        valid = jnp.ones(10, bool)
        removed = np.asarray(splat.splat_selected(
            photons, idx, valid, dim, multiplier=-1.0))
        added = np.asarray(splat.splat_selected(
            photons, idx, valid, dim, multiplier=1.0))
        np.testing.assert_allclose(full + removed + added, full,
                                   rtol=1e-4, atol=1e-7)

    def test_selected_equals_full_when_all_selected(self):
        photons, _, _ = _make_photons(n=32, max_i=2)
        dim = (12, 12, 12)
        full = np.asarray(splat.splat_all(photons, dim))
        idx = jnp.arange(32, dtype=jnp.int32)
        sel = np.asarray(splat.splat_selected(
            photons, idx, jnp.ones(32, bool), dim))
        np.testing.assert_allclose(sel, full, rtol=1e-5, atol=1e-8)

    def test_invalid_lanes_ignored(self):
        photons, _, _ = _make_photons(n=32, max_i=1)
        dim = (8, 8, 8)
        idx = jnp.array([0, 1, 2, 3], jnp.int32)
        valid = jnp.array([True, True, False, False])
        a = np.asarray(splat.splat_selected(photons, idx, valid, dim))
        b = np.asarray(splat.splat_selected(
            photons, idx[:2], jnp.ones(2, bool), dim))
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_light_volume_dim():
    assert splat.light_volume_dim(constants.DEFAULT_RADIUS_REL) == 65
    assert splat.light_volume_dim(0.25) == 4


class TestProductSplat:
    """The MXU (separable product-Epanechnikov) splat paths: numpy oracle,
    XLA/Pallas twin equality, mass parity with the radial scatter path."""

    def _product_oracle(self, pos, pw, valid, r, scale, dim):
        d, h, w = dim
        out = np.zeros((d, h, w, 3), np.float64)
        zc = (np.arange(d) + 0.5) / d
        yc = (np.arange(h) + 0.5) / h
        xc = (np.arange(w) + 0.5) / w

        def k(dist):
            return np.maximum(0.75 * (1.0 - (dist / r) ** 2), 0.0)

        from cpm_tpu.pallas.splat_mxu import PRODUCT_KERNEL_MATCH
        for i in range(pos.shape[0]):
            if not valid[i]:
                continue
            wz = k(zc - pos[i, 2])[:, None, None]
            wy = k(yc - pos[i, 1])[None, :, None]
            wx = k(xc - pos[i, 0])[None, None, :]
            out += (wz * wy * wx)[..., None] * (
                pw[i] * scale * PRODUCT_KERNEL_MATCH)
        return out.astype(np.float32)

    def test_matmul_matches_oracle(self):
        photons, pos, pow_ = _make_photons(n=48, max_i=2, radius=0.09)
        dim = (16, 16, 16)
        ours = np.asarray(splat.splat_all(photons, dim, method="matmul"))
        scale = float(constants.ISOTROPIC_PHASE
                      * relative_irradiance_scale(48, photons.radius_rel))
        flat_pos = pos.reshape(-1, 3)
        flat_pow = pow_.reshape(-1, 3)
        valid = flat_pos[:, 0] < 1e30
        ref = self._product_oracle(flat_pos, flat_pow, valid, 0.09, scale, dim)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)

    def test_pallas_matches_matmul(self):
        photons, _, _ = _make_photons(n=32, max_i=2, radius=0.09)
        dim = (16, 16, 16)
        a = np.asarray(splat.splat_all(photons, dim, method="matmul"))
        b = np.asarray(splat.splat_all(photons, dim,
                                       method="pallas_interpret"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    def test_mass_matches_radial_kernel(self):
        """The PRODUCT_KERNEL_MATCH factor equalizes deposited energy with
        the reference's radial kernel (away from borders, fine grids)."""
        n = 8
        rng = np.random.default_rng(3)
        pos = rng.uniform(0.35, 0.65, (1, n, 3)).astype(np.float32)
        pow_ = np.ones((1, n, 3), np.float32)
        photons = PhotonData(
            positions=jnp.asarray(pos), powers=jnp.asarray(pow_),
            directions=jnp.zeros((1, n, 2), jnp.float32),
            exit_power=jnp.zeros(n, jnp.float32),
            exit_direction=jnp.zeros((n, 2), jnp.float32),
            radius_rel=jnp.float32(0.12),
            scene_radius=jnp.float32(np.sqrt(3.0)),
            iteration=jnp.int32(0))
        dim = (48, 48, 48)
        radial = np.asarray(splat.splat_all(photons, dim, footprint=14,
                                            method="scatter"))
        product = np.asarray(splat.splat_all(photons, dim, method="matmul"))
        assert radial.sum() == pytest.approx(product.sum(), rel=0.02)

    def test_selected_product_remove_add(self):
        photons, _, _ = _make_photons(n=32, max_i=2, radius=0.09)
        dim = (16, 16, 16)
        idx = jnp.arange(32, dtype=jnp.int32)
        valid = jnp.ones(32, bool)
        full = splat.splat_all(photons, dim, method="matmul")
        sel = splat.splat_selected(photons, idx, valid, dim, method="matmul")
        np.testing.assert_allclose(np.asarray(sel), np.asarray(full),
                                   rtol=1e-5, atol=1e-7)
        neg = splat.splat_selected(photons, idx, valid, dim,
                                   multiplier=-1.0, method="matmul")
        np.testing.assert_allclose(np.asarray(full + neg), 0.0, atol=1e-6)
