"""NEE light sampling (lightsampling.cl:59-140 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.lights import Light
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import nee


def _pts(n=64, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(n, 3), jnp.float32)


class TestSampleLightToward:
    def test_point_inverse_square(self):
        light = Light.point((0.5, 0.5, 0.5), radiance=(2.0, 1.0, 0.5))
        p = _pts()
        wi, power, pdf, origin = nee.sample_light_toward(light, p)
        d = np.linalg.norm(np.asarray(p) - 0.5, axis=1)
        np.testing.assert_allclose(np.asarray(power)[:, 0],
                                   2.0 / np.maximum(d * d, 1e-12), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(pdf), 1.0)
        # wi points from the light toward the position
        np.testing.assert_allclose(
            np.asarray(wi),
            (np.asarray(p) - 0.5) / np.maximum(d, 1e-9)[:, None], atol=1e-5)

    def test_cone_aperture_zeroes_outside(self):
        light = Light.cone((0.5, 0.5, -1.0), (0.0, 0.0, 1.0),
                           cos_fov=np.cos(np.deg2rad(10.0)))
        on_axis = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
        off_axis = jnp.asarray([[0.95, 0.5, 0.0]], jnp.float32)
        _, pw_on, pdf_on, _ = nee.sample_light_toward(light, on_axis)
        _, pw_off, pdf_off, _ = nee.sample_light_toward(light, off_axis)
        assert float(pw_on[0, 0]) > 0 and float(pdf_on[0]) == 1.0
        assert float(pw_off[0, 0]) == 0.0 and float(pdf_off[0]) == 0.0

    def test_area_pdf_geometry(self):
        light = Light(type=1, position=(0.5, 0.5, 0.0),
                      direction=(0.0, 0.0, 1.0), size=(0.2, 0.4))
        p = jnp.asarray([[0.5, 0.5, 0.8]], jnp.float32)
        wi, power, pdf, origin = nee.sample_light_toward(light, p)
        # deterministic (no key): center of the quad, straight above it
        np.testing.assert_allclose(np.asarray(origin)[0],
                                   [0.5, 0.5, 0.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(pdf)[0],
                                   0.8 ** 2 / (1.0 * 0.2 * 0.4), rtol=1e-5)
        # behind the quad: zero
        pb = jnp.asarray([[0.5, 0.5, -0.8]], jnp.float32)
        _, pw_b, pdf_b, _ = nee.sample_light_toward(light, pb)
        assert float(pdf_b[0]) == 0.0 and float(pw_b[0, 0]) == 0.0

    def test_nee_single_scatter_attenuates(self):
        volume = Volume.from_data(synthetic.sphere_in_box(24, radius=0.25))
        tf = TransferFunction.from_points(*synthetic.default_tf_points())
        light = Light.directional((0.0, 0.0, 1.0))
        # point in front of (facing light) vs behind the dense sphere
        front = jnp.asarray([[0.5, 0.5, 0.1]], jnp.float32)
        behind = jnp.asarray([[0.5, 0.5, 0.9]], jnp.float32)
        lf = nee.nee_single_scatter(light, volume, tf, front)
        lb = nee.nee_single_scatter(light, volume, tf, behind)
        assert float(lf[0, 0]) > 5.0 * float(lb[0, 0])
