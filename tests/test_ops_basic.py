"""Ray-box intersection, trilinear sampling, phase functions, light plane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.ops import intersect, lightplane, phase, sampling


class TestRayBox:
    def test_hit_through_center(self):
        o = jnp.array([[0.5, 0.5, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hit, t0, t1 = intersect.ray_box(o, d)
        assert bool(hit[0])
        assert float(t0[0]) == pytest.approx(1.0, abs=1e-5)
        assert float(t1[0]) == pytest.approx(2.0, abs=1e-5)

    def test_miss(self):
        o = jnp.array([[2.0, 2.0, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hit, _, _ = intersect.ray_box(o, d)
        assert not bool(hit[0])

    def test_inside_box(self):
        o = jnp.array([[0.5, 0.5, 0.5]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        hit, t0, t1 = intersect.ray_box(o, d)
        assert bool(hit[0])
        assert float(t0[0]) == pytest.approx(0.0, abs=1e-6)
        assert float(t1[0]) == pytest.approx(0.5, abs=1e-5)

    def test_miss_sentinel_span(self):
        o = jnp.array([[5.0, 5.0, 5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        span = intersect.light_sample_box_intersection(o, d)
        assert float(span[0, 0]) == 0.0 and float(span[0, 1]) == -1.0


class TestTrilinear:
    def test_constant_volume(self):
        vol = jnp.full((8, 8, 8), 0.7, jnp.float32)
        pos = jnp.array([[0.3, 0.6, 0.9], [0.01, 0.5, 0.99]])
        v = sampling.sample_volume_trilinear(vol, pos)
        np.testing.assert_allclose(np.asarray(v), 0.7, atol=1e-6)

    def test_gradient_volume_center_values(self):
        # Volume linear in x: value = (ix+0.5)/8
        ix = (np.arange(8) + 0.5) / 8
        vol = jnp.asarray(np.broadcast_to(ix, (8, 8, 8)), jnp.float32)
        # At voxel centers the trilinear fetch is exact
        pos = jnp.array([[(i + 0.5) / 8, 0.5, 0.5] for i in range(8)])
        v = sampling.sample_volume_trilinear(vol, pos)
        np.testing.assert_allclose(np.asarray(v), ix, atol=1e-6)

    def test_matches_scipy_map_coordinates(self):
        from scipy import ndimage
        rng = np.random.default_rng(1)
        vol = rng.random((16, 12, 10)).astype(np.float32)
        pos = rng.uniform(0.1, 0.9, size=(50, 3)).astype(np.float32)
        ours = sampling.sample_volume_trilinear(jnp.asarray(vol),
                                                jnp.asarray(pos))
        dims = np.array([10, 12, 16])
        coords = (pos * dims - 0.5).T[::-1]  # z, y, x
        ref = ndimage.map_coordinates(vol, coords, order=1, mode="nearest")
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_vector_volume(self):
        vol = jnp.stack([jnp.full((4, 4, 4), 1.0), jnp.full((4, 4, 4), 2.0),
                         jnp.full((4, 4, 4), 3.0)], axis=-1)
        v = sampling.sample_volume_trilinear_vec(vol, jnp.array([[0.5, 0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(v[0]), [1.0, 2.0, 3.0], atol=1e-6)


class TestStratifiedGrid:
    def test_deterministic_centers(self):
        s = sampling.stratified_grid_2d(4, 4)
        assert s.shape == (16, 4)
        assert float(s[0, 0]) == pytest.approx(0.125)
        np.testing.assert_allclose(np.asarray(s[:, 3]), 1.0)

    def test_jittered_in_strata(self):
        s = sampling.stratified_grid_2d(8, 8, key=jax.random.PRNGKey(0))
        u = np.asarray(s[:, 0]).reshape(8, 8)
        for col in range(8):
            assert np.all((u[:, col] >= col / 8) & (u[:, col] <= (col + 1) / 8))


class TestHilbert:
    def test_bijective_on_grid(self):
        n = 16
        ij = np.stack(np.meshgrid(np.arange(n), np.arange(n)), -1).reshape(-1, 2)
        u = (ij[:, 0] + 0.5) / n
        v = (ij[:, 1] + 0.5) / n
        d = sampling.hilbert_index_2d(jnp.asarray(u), jnp.asarray(v), order=4)
        d = np.asarray(d)
        assert len(np.unique(d)) == n * n
        assert d.min() == 0 and d.max() == n * n - 1

    def test_locality(self):
        # Consecutive Hilbert indices are adjacent cells
        n = 16
        idx_to_xy = {}
        for i in range(n):
            for j in range(n):
                d = int(sampling.hilbert_index_2d(
                    jnp.float32((i + 0.5) / n), jnp.float32((j + 0.5) / n),
                    order=4))
                idx_to_xy[d] = (i, j)
        for k in range(n * n - 1):
            x0, y0 = idx_to_xy[k]
            x1, y1 = idx_to_xy[k + 1]
            assert abs(x0 - x1) + abs(y0 - y1) == 1


class TestPhase:
    def test_isotropic_pdf(self):
        wi = jnp.array([[0.0, 0.0, 1.0]])
        wo, pdf = phase.sample_isotropic(wi, jnp.array([0.3]), jnp.array([0.7]))
        assert float(pdf[0]) == pytest.approx(1 / (4 * np.pi))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(wo[0])), 1.0,
                                   atol=1e-5)

    def test_hg_mean_cosine(self):
        # E[cos theta] = g for Henyey-Greenstein
        g = 0.6
        n = 20000
        key = jax.random.PRNGKey(2)
        u = jax.random.uniform(key, (2, n))
        wi = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        wo, _ = phase.sample_hg(wi, g, u[0], u[1])
        mean_cos = float(jnp.mean(wo[:, 2]))
        assert mean_cos == pytest.approx(g, abs=0.02)

    def test_hg_g_zero_matches_isotropic(self):
        n = 5000
        u = jax.random.uniform(jax.random.PRNGKey(3), (2, n))
        wi = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        wo, pdf = phase.sample_hg(wi, 0.0, u[0], u[1])
        assert float(jnp.mean(wo[:, 2])) == pytest.approx(0.0, abs=0.03)
        np.testing.assert_allclose(np.asarray(pdf), 1 / (4 * np.pi), atol=1e-6)

    def test_hg_phase_normalizes(self):
        # integral over sphere of hg = 1
        mu = np.linspace(-1, 1, 20001)
        p = np.asarray(phase.hg_phase(jnp.asarray(mu), jnp.float32(0.7)))
        integral = 2 * np.pi * np.trapz(p, mu)
        assert integral == pytest.approx(1.0, abs=1e-3)


class TestLightPlane:
    def test_convex_hull_square(self):
        pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
        hull = lightplane.convex_hull_2d(pts)
        assert len(hull) == 4

    def test_min_rect_rotated_square(self):
        ang = np.deg2rad(30)
        rot = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        square = np.array([[0, 0], [1, 0], [1, 1], [0, 1]]) @ rot.T
        hull = lightplane.convex_hull_2d(square)
        o, u, v = lightplane.minimum_bounding_rectangle(hull)
        area = abs(np.cross(u, v))
        assert area == pytest.approx(1.0, abs=1e-6)

    def test_fit_plane_covers_box(self):
        corners = lightplane.unit_box_corners()
        for direction in ([0, 0, 1], [1, 1, 1], [0.3, -0.8, 0.5]):
            o, u, v, area = lightplane.fit_light_plane(corners, direction)
            n = np.asarray(direction, float)
            n /= np.linalg.norm(n)
            # All corners must project inside the rectangle
            for c in corners:
                rel = c - o
                pu = np.dot(rel, u) / np.dot(u, u)
                pv = np.dot(rel, v) / np.dot(v, v)
                assert -1e-6 <= pu <= 1 + 1e-6
                assert -1e-6 <= pv <= 1 + 1e-6
            # Plane is behind the box w.r.t. light direction
            assert all(np.dot(c - o, n) >= -1e-9 for c in corners)

    def test_axis_aligned_area(self):
        corners = lightplane.unit_box_corners()
        _, u, v, area = lightplane.fit_light_plane(corners, [0, 0, 1])
        assert float(area) == pytest.approx(1.0, abs=1e-5)
