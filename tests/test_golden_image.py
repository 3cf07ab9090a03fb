"""End-to-end golden-image oracle (SURVEY §4 core strategy, round-3
VERDICT weak #5): trace -> radial splat -> DVR march entirely in float64
numpy, compared against the pipeline's splat + sweep render; plus a
quantified bound on the product-vs-radial splat kernel substitution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core import constants
from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import RenderConfig, TracerConfig
from cpm_tpu.core.lights import Light
from cpm_tpu.core.types import (TransferFunction, Volume,
                                relative_irradiance_scale)
from cpm_tpu.io import synthetic
from cpm_tpu.oracle import reference as oracle
from cpm_tpu.ops import emit, sampling, splat, tracer
from cpm_tpu.ops import sweep_render as sw

DIM = 16
LV = 8


@pytest.fixture(scope="module")
def traced():
    volume = Volume.from_data(synthetic.smoke_cloud(DIM, seed=6))
    tf_pos = jnp.array([0.0, 0.3, 0.35, 1.0])
    tf_cols = jnp.array([[0.2, 0.2, 0.2, 0.0], [0.2, 0.2, 0.2, 0.0],
                         [0.9, 0.8, 0.7, 0.5], [1.0, 1.0, 1.0, 0.8]])
    tf = TransferFunction.from_points(tf_pos, tf_cols)
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    ls = emit.emit(Light.directional((0.0, -1.0, 0.3)),
                   sampling.stratified_grid_2d(32, 32))
    cfg = TracerConfig(max_interactions=2, max_steps=1200,
                       use_compaction=False)
    photons = tracer.trace_photons(volume, tf, tfs, ls,
                                   jax.random.PRNGKey(11), cfg)
    return volume, tf, (tf_pos, tf_cols), photons


def _oracle_splat(photons):
    i, n, _ = photons.positions.shape
    pos = np.asarray(photons.positions, np.float64).reshape(i * n, 3)
    pw = np.asarray(photons.powers, np.float64).reshape(i * n, 3)
    valid = pos[:, 0] < 1e30
    r = float(photons.radius_rel)
    scale = float(constants.ISOTROPIC_PHASE
                  * relative_irradiance_scale(n, photons.radius_rel))
    return oracle.splat_oracle(pos, pw, valid, r, scale, (LV, LV, LV))


def _sweep_vs_rays(volume, tf, lv, cam):
    cfg = RenderConfig(width=24, height=24, sampling_rate=2.0)
    img, inter, grid = sw.sweep_render(volume, tf, jnp.asarray(
        lv, jnp.float32), cam, cfg, return_intermediate=True)
    u_lo, u_hi, v_lo, v_hi, za = grid
    axis, _ = sw.principal_axis(cam)
    V, U = inter.shape[:2]
    u = np.asarray(u_lo) + (np.arange(U) + 0.5) / U * float(u_hi - u_lo)
    v = np.asarray(v_lo) + (np.arange(V) + 0.5) / V * float(v_hi - v_lo)
    b_axis, c_axis = [i for i in range(3) if i != axis]
    P = np.zeros((V, U, 3), np.float64)
    P[..., axis] = np.asarray(za)[0]
    P[..., b_axis] = u[None, :]
    P[..., c_axis] = v[:, None]
    eye = np.asarray(cam.eye, np.float64)
    o = np.broadcast_to(eye, P.shape).reshape(-1, 3)
    d = P.reshape(-1, 3) - o
    return img, np.asarray(inter), (o, d, np.asarray(za, np.float64), axis,
                                    cfg.ambient)


class TestGoldenImage:
    def test_pipeline_matches_float64_oracle(self, traced):
        """scatter-splat + sweep == full float64 numpy photon-map render
        (radial Epanechnikov splat + DVR z-plane march)."""
        volume, tf, (tf_pos, tf_cols), photons = traced
        lv_oracle = _oracle_splat(photons)

        lv_jax = splat.splat_all(photons, (LV, LV, LV), footprint=4,
                                 method="scatter")
        np.testing.assert_allclose(np.asarray(lv_jax), lv_oracle,
                                   rtol=1e-4, atol=1e-6)

        cam = Camera.create(eye=(0.45, 0.6, -1.5))
        img, inter, (o, d, za, axis, ambient) = _sweep_vs_rays(
            volume, tf, lv_jax, cam)
        golden = oracle.dvr_zplane_oracle(
            np.asarray(volume.data, np.float64),
            np.asarray(tf_pos, np.float64), np.asarray(tf_cols, np.float64),
            lv_oracle, o, d, za, axis, ambient).reshape(inter.shape)
        err = np.abs(inter - golden)
        assert err.max() < 2e-3, err.max()
        assert err.mean() < 5e-5, err.mean()

    def test_product_kernel_image_delta_bounded(self, traced):
        """The MXU product-Epanechnikov splat (pallas/splat_mxu.py) is
        matched to the radial kernel in total mass; bound its *image-space*
        deviation: <2% mean relative on this scene."""
        volume, tf, _, photons = traced
        lv_radial = splat.splat_all(photons, (LV, LV, LV), footprint=4,
                                    method="scatter")
        lv_product = splat.splat_all(photons, (LV, LV, LV), footprint=4,
                                     method="auto")
        cam = Camera.create(eye=(0.45, 0.6, -1.5))
        img_r, _, _ = _sweep_vs_rays(volume, tf, lv_radial, cam)
        img_p, _, _ = _sweep_vs_rays(volume, tf, lv_product, cam)
        a, b = np.asarray(img_p), np.asarray(img_r)
        rel_l1 = np.abs(a - b).sum() / (np.abs(b).sum() + 1e-12)
        assert rel_l1 < 0.02, rel_l1
        # and the substitution must not shift total image energy by >1%
        assert abs(a.sum() - b.sum()) / (abs(b.sum()) + 1e-12) < 0.01
