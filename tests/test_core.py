"""Core data structures, TF sampling, direction encoding, radius schedule."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core import constants
from cpm_tpu.core.types import (PhotonData, TransferFunction, Volume,
                                decode_direction, encode_direction,
                                progressive_sphere_radius,
                                relative_irradiance_scale, sphere_volume)


def test_tf_lut_matches_points():
    tf = TransferFunction.from_points(
        [0.0, 0.5, 1.0],
        [(0, 0, 0, 0), (1.0, 0.5, 0.25, 0.5), (0, 0, 0, 1.0)],
        lut_size=512)
    # Sample exactly on a control point
    v = tf.sample(jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(v[0]), [1.0, 0.5, 0.25, 0.5],
                               atol=2e-3)
    # Monotone opacity ramp between 0.5 and 1.0
    v2 = tf.sample(jnp.array([0.75]))
    assert 0.5 < float(v2[0, 3]) < 1.0


def test_tf_sample_clamps_edges():
    tf = TransferFunction.from_points([0.0, 1.0], [(0, 0, 0, 0), (1, 1, 1, 1)])
    lo = tf.sample(jnp.array([-0.5]))
    hi = tf.sample(jnp.array([1.5]))
    # Exact point-list evaluation clamps to the edge control colors.
    assert float(lo[0, 3]) == pytest.approx(0.0)
    assert float(hi[0, 3]) == pytest.approx(1.0)
    # The baked-LUT path clamps to its edge texels (reference texture
    # semantics: first/last texel centers at +-0.5/K).
    assert float(tf.sample_lut(jnp.array([-0.5]))[0, 3]) == pytest.approx(
        float(tf.lut[0, 3]))
    assert float(tf.sample_lut(jnp.array([1.5]))[0, 3]) == pytest.approx(
        float(tf.lut[-1, 3]))


def test_tf_sample_matches_lut_discretization():
    """sample() (exact points) and sample_lut() (baked) agree to LUT
    resolution everywhere."""
    tf = TransferFunction.from_points(*_ramp_points(), lut_size=1024)
    x = jnp.linspace(0.0, 1.0, 777)
    a = np.asarray(tf.sample(x))
    b = np.asarray(tf.sample_lut(x))
    # max LUT bake error ~ max_slope/(2*lut_size) = 9/2048 here
    np.testing.assert_allclose(a, b, atol=6e-3)


def _ramp_points():
    return ([0.0, 0.1, 0.5, 1.0],
            [(0, 0, 0, 0), (0.2, 0.3, 0.9, 0.02),
             (0.9, 0.6, 0.2, 0.3), (1, 1, 1, 0.8)])


def test_direction_encode_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    enc = encode_direction(jnp.asarray(d, jnp.float32))
    dec = decode_direction(enc)
    np.testing.assert_allclose(np.asarray(dec), d, atol=1e-5)


def test_progressive_radius_schedule():
    # photondata.cpp:73-80 -- r_{i+1} = r_i*((i+a)/(i+1))^(1/3), shrinking
    r = 1.0
    for i in range(10):
        r_next = float(progressive_sphere_radius(jnp.float32(r), i, 0.3))
        expected = r * ((i + 0.3) / (i + 1.0)) ** (1.0 / 3.0)
        assert r_next == pytest.approx(expected, rel=1e-5)
        assert r_next < r
        r = r_next


def test_irradiance_scale_matches_reference_formula():
    n = 65536
    r = constants.DEFAULT_RADIUS_REL
    scale = float(relative_irradiance_scale(n, jnp.float32(r)))
    expected = (1.0 / np.pi) / (sphere_volume(r) * n)
    assert scale == pytest.approx(expected, rel=1e-5)


def test_volume_scene_radius():
    vol = Volume.from_data(np.zeros((8, 8, 8), np.float32))
    # getSceneRadius (progressivephotontracercl.cpp:659-672):
    # basis = 2*I -> world extent (2,2,2) -> radius 0.5*|(2,2,2)| = sqrt(3).
    # (The reference's defaultSceneRadius *constant* 1.1447 disagrees with
    # its own comment formula; the runtime path computes this.)
    assert float(vol.scene_radius()) == pytest.approx(np.sqrt(3.0), rel=1e-6)


def test_photondata_create_sentinels():
    p = PhotonData.create(16, max_interactions=4)
    assert p.positions.shape == (4, 16, 3)
    assert bool(jnp.all(p.positions > 1e30))
    assert p.max_interactions == 4 and p.n == 16
