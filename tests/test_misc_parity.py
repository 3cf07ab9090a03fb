"""Smaller reference-parity features: half photon storage
(photon.cl:49-63), Hilbert sample ordering (samplegridindex.cl:51-85
wired into emission), SamplesToImage debug histogram."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import PipelineConfig, RenderConfig, SplatConfig, TracerConfig
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import debug, emit, sampling, splat, tracer
from cpm_tpu.pipeline import step as pstep


def _trace(photon_dtype):
    volume = Volume.from_data(synthetic.smoke_cloud(16, seed=5))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    ls = emit.emit(Light.directional((0.0, -1.0, 0.3)),
                   sampling.stratified_grid_2d(16, 16))
    cfg = TracerConfig(max_interactions=2, max_steps=800,
                       use_compaction=False, photon_dtype=photon_dtype)
    return tracer.trace_photons(volume, tf, tfs, ls, jax.random.PRNGKey(1),
                                cfg)


class TestHalfPhotonStorage:
    def test_f16_close_to_f32_and_splats(self):
        p32 = _trace("float32")
        p16 = _trace("float16")
        assert p16.positions.dtype == jnp.float16
        dep32 = np.asarray(p32.positions[..., 0] < 1e30)
        dep16 = np.asarray(p16.positions[..., 0].astype(jnp.float32) < 1e30)
        np.testing.assert_array_equal(dep32, dep16)  # same deposit set
        a = np.asarray(p16.positions.astype(jnp.float32))[dep32]
        b = np.asarray(p32.positions)[dep32]
        np.testing.assert_allclose(a, b, atol=1e-3)  # ~2^-11 quantization

        lv32 = np.asarray(splat.splat_all(p32, (8, 8, 8), footprint=4,
                                          method="scatter"))
        lv16 = np.asarray(splat.splat_all(p16, (8, 8, 8), footprint=4,
                                          method="scatter"))
        rel = np.abs(lv16 - lv32).sum() / (np.abs(lv32).sum() + 1e-12)
        assert rel < 0.02, rel


class TestHilbertOrdering:
    def test_same_sample_set_spatially_coherent(self):
        volume = Volume.from_data(synthetic.smoke_cloud(16, seed=5))
        tf = TransferFunction.from_points(*synthetic.default_tf_points())
        tfs = TransferFunction.from_points(
            *synthetic.default_scattering_points())
        scene = Scene.create(volume, tf, tfs,
                             [Light.directional((0.0, -1.0, 0.3))],
                             Camera.create())
        base = PipelineConfig(photons_x=16, photons_y=16,
                              splat=SplatConfig(volume_size_from_radius=False,
                                                volume_dim=8),
                              render=RenderConfig(width=8, height=8))
        from dataclasses import replace
        hil = replace(base, sample_order="hilbert")
        key = jax.random.PRNGKey(0)
        ls_lin = pstep.emit_all(scene, base, key)
        ls_hil = pstep.emit_all(scene, hil, key)
        a = np.asarray(ls_lin.origins)
        b = np.asarray(ls_hil.origins)
        # same multiset of samples, different order
        np.testing.assert_allclose(np.sort(a.ravel()), np.sort(b.ravel()),
                                   atol=1e-6)
        assert not np.allclose(a, b)

        # Hilbert order is more spatially coherent: smaller mean distance
        # between consecutive sample origins than raster order's wrap rows.
        def mean_step(x):
            return float(np.linalg.norm(np.diff(x, axis=0), axis=1).mean())
        assert mean_step(b) < mean_step(a)


class TestSamplesToImage:
    def test_uniform_grid_is_flat(self):
        s = sampling.stratified_grid_2d(32, 32)
        img = debug.samples_to_image(s, width=16, height=16)
        np.testing.assert_allclose(np.asarray(img), 1.0, rtol=1e-5)

    def test_pdf_weighting(self):
        s = np.zeros((2, 4), np.float32)
        s[0] = [0.1, 0.1, 0.0, 3.0]
        s[1] = [0.9, 0.9, 0.0, 1.0]
        img = np.asarray(debug.samples_to_image(jnp.asarray(s), 4, 4,
                                                normalize=False))
        assert img[0, 0] == 3.0 and img[3, 3] == 1.0
        assert img.sum() == 4.0
