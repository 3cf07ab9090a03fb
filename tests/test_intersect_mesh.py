"""Triangle-mesh light intersection (Moller-Trumbore) + tracer clip AABB.

Reference: lightsamplemeshintersection.cl:36-58 (mesh spans) and
progressivephotontracercl.cpp:674-686 (clip planes as the tracer's
bounding box)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.config import TracerConfig
from cpm_tpu.core.lights import Light
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import emit, intersect, sampling, tracer


def _random_rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = rs.rand(n, 3).astype(np.float32) * 3.0 - 1.0
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestMeshIntersection:
    def test_box_mesh_matches_slab(self):
        """The 12-triangle cube must reproduce the AABB slab spans."""
        o, d = _random_rays(256)
        verts, faces = intersect.box_mesh()
        span_mesh = intersect.light_sample_mesh_intersection(o, d, verts,
                                                            faces)
        span_box = intersect.light_sample_box_intersection(o, d)
        sm, sb = np.asarray(span_mesh), np.asarray(span_box)
        # Same hit set (edge grazes may differ) and same spans where hit.
        hit_m, hit_b = sm[:, 1] >= sm[:, 0], sb[:, 1] >= sb[:, 0]
        agree = hit_m == hit_b
        assert agree.mean() > 0.99
        both = hit_m & hit_b
        np.testing.assert_allclose(sm[both], sb[both], rtol=1e-4, atol=1e-5)

    def test_tetrahedron_is_not_a_box(self):
        """A test a box cannot pass: rays aimed at the cube corner OUTSIDE
        an inscribed tetrahedron must miss it while hitting the box, and
        tetra spans must be strictly inside the box spans."""
        verts = jnp.asarray(np.array(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
             [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], np.float32))
        faces = jnp.asarray(np.array(
            [[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32))
        # Ray through the (1,1,1) corner region: inside the box, outside
        # the tetrahedron x+y+z <= 1.
        o = jnp.asarray(np.array([[0.9, 0.9, -1.0]], np.float32))
        d = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
        span_t = np.asarray(intersect.light_sample_mesh_intersection(
            o, d, verts, faces))[0]
        span_b = np.asarray(intersect.light_sample_box_intersection(o, d))[0]
        assert span_b[1] > span_b[0]  # box hit
        assert span_t[1] < span_t[0]  # tetra miss -> (0, -1)

        # Ray through the centroid region: both hit, tetra span shorter.
        o2 = jnp.asarray(np.array([[0.2, 0.2, -1.0]], np.float32))
        span_t2 = np.asarray(intersect.light_sample_mesh_intersection(
            o2, d, verts, faces))[0]
        span_b2 = np.asarray(intersect.light_sample_box_intersection(
            o2, d))[0]
        assert span_t2[1] > span_t2[0]
        # enters at z=0 face like the box, exits on the slanted face
        np.testing.assert_allclose(span_t2[0], span_b2[0], atol=1e-5)
        assert span_t2[1] < span_b2[1] - 0.1

    def test_tetra_exit_matches_analytic_plane(self):
        """Exit parameter equals the analytic x+y+z=1 plane hit."""
        verts = jnp.asarray(np.array(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
             [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], np.float32))
        faces = jnp.asarray(np.array(
            [[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int32))
        o = jnp.asarray(np.array([[0.1, 0.3, -0.5]], np.float32))
        d = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
        span = np.asarray(intersect.light_sample_mesh_intersection(
            o, d, verts, faces))[0]
        t_exit_analytic = (1.0 - 0.1 - 0.3) - (-0.5)  # z where x+y+z=1
        np.testing.assert_allclose(span[1], t_exit_analytic, atol=1e-5)


class TestClipPlanes:
    def test_photons_confined_to_clip_box(self):
        volume = Volume.from_data(synthetic.smoke_cloud(32, seed=4))
        tf = TransferFunction.from_points(*synthetic.default_tf_points())
        tfs = TransferFunction.from_points(
            *synthetic.default_scattering_points())
        ls = emit.emit(Light.directional((0.0, -1.0, 0.3)),
                       sampling.stratified_grid_2d(24, 24))
        clip = TracerConfig(max_interactions=3, max_steps=1500,
                            use_compaction=False,
                            clip_min=(0.0, 0.0, 0.0),
                            clip_max=(1.0, 0.5, 1.0))
        ph = tracer.trace_photons(volume, tf, tfs, ls,
                                  jax.random.PRNGKey(0), clip)
        pos = np.asarray(ph.positions)
        dep = pos[..., 0] < 1e30
        assert dep.sum() > 20
        assert pos[dep][:, 1].max() <= 0.5 + 1e-3

        # and the unclipped trace does deposit beyond y = 0.5
        full = TracerConfig(max_interactions=3, max_steps=1500,
                            use_compaction=False)
        ph2 = tracer.trace_photons(volume, tf, tfs, ls,
                                   jax.random.PRNGKey(0), full)
        pos2 = np.asarray(ph2.positions)
        dep2 = pos2[..., 0] < 1e30
        assert pos2[dep2][:, 1].max() > 0.6
