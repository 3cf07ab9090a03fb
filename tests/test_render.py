"""Camera ray-march render: dense-batch marcher vs sequential-loop oracle.

The dense marcher (ops/gather.py:render_rays) is the production path on TPU
(top-level gathers stay on the XLA fast path); the fori_loop marcher
(render_rays_loop) is the straight transcription of the reference's
LightingRaycaster sampling loop and serves as the allclose oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import RenderConfig
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import gather


@pytest.fixture(scope="module")
def scene_small():
    volume = Volume.from_data(synthetic.smoke_cloud(32, seed=3))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    lv = jax.random.uniform(jax.random.PRNGKey(7), (16, 16, 16, 3)) * 0.4
    cam = Camera.create()
    return volume, tf, lv, cam


class TestDenseVsLoop:
    def test_allclose_full_frame(self, scene_small):
        volume, tf, lv, cam = scene_small
        o, d = cam.rays(24, 24)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        a = gather.render_rays(volume, tf, lv, o, d, n_steps=48)
        b = gather.render_rays_loop(volume, tf, lv, o, d, n_steps=48)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def test_allclose_with_chunking(self, scene_small):
        """Chunk boundaries (incl. a ragged final chunk) don't change pixels."""
        volume, tf, lv, cam = scene_small
        o, d = cam.rays(18, 13)  # 234 rays: not a multiple of the chunk
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        a = gather.render_rays(volume, tf, lv, o, d, n_steps=32, chunk=100)
        b = gather.render_rays(volume, tf, lv, o, d, n_steps=32, chunk=234)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    def test_miss_rays_transparent(self, scene_small):
        volume, tf, lv, _ = scene_small
        o = jnp.array([[5.0, 5.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        img = gather.render_rays(volume, tf, lv, o, d, n_steps=16)
        np.testing.assert_allclose(np.asarray(img), 0.0, atol=1e-7)

    def test_render_shape_and_alpha_range(self, scene_small):
        volume, tf, lv, cam = scene_small
        img = gather.render(volume, tf, lv, cam,
                            RenderConfig(width=20, height=16))
        assert img.shape == (16, 20, 4)
        a = np.asarray(img[..., 3])
        assert (a >= -1e-6).all() and (a <= 1.0 + 1e-6).all()
        assert a.max() > 0.01  # something visible

    def test_dense_is_differentiable(self, scene_small):
        """The dense marcher must be reverse-differentiable (the loop
        marcher is not): grad of a scalar loss w.r.t. the light volume."""
        volume, tf, lv, cam = scene_small
        o, d = cam.rays(8, 8)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)

        def loss(lv_):
            img = gather.render_rays(volume, tf, lv_, o, d, n_steps=24)
            return jnp.sum(img[:, :3])

        g = jax.grad(loss)(lv)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0.0
