"""Screen-space importance: per-pixel DDA vs a numpy quadrature oracle,
threshold semantics, and the camera-visibility importance mix."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import PipelineConfig, RenderConfig, TracerConfig
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import minmax, screen_importance
from cpm_tpu.pipeline import step as pstep


def _setup(dim=32):
    vol = Volume.from_data(synthetic.sphere_in_box(dim))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    return vol, tf, minmax.volume_min_max(vol, 8)


class TestThreshold:
    def test_endpoint_alpha_rules(self):
        tf = TransferFunction.from_points(
            [0.2, 0.8], [(1, 1, 1, 0.0), (1, 1, 1, 0.5)])
        lo, hi = np.asarray(screen_importance.data_threshold_from_tf(tf))
        assert lo == pytest.approx(0.2)  # zero-alpha start -> window shrinks
        assert hi == pytest.approx(1.0)  # positive-alpha end -> full

    def test_visibility_grid_culls(self):
        vol, tf, mm = _setup()
        thr = jnp.array([0.5, 1.0])
        vis = np.asarray(screen_importance.visibility_grid(mm, thr))
        mmn = np.asarray(mm.data)
        np.testing.assert_array_equal(vis == 0.0, mmn[..., 1] < 0.5)


class TestPixelImportance:
    def test_matches_quadrature_oracle(self):
        vol, tf, mm = _setup()
        cam = Camera.create()
        w = h = 24
        imp = np.asarray(screen_importance.screen_space_importance(
            mm, tf, cam, width=w, height=h))
        assert imp.shape == (h, w)

        # numpy oracle: dense quadrature of the visibility indicator
        from cpm_tpu.ops import intersect
        thr = np.asarray(screen_importance.data_threshold_from_tf(tf))
        vis = np.asarray(screen_importance.visibility_grid(
            mm, jnp.asarray(thr)))
        origins, dirs = cam.rays(w, h)
        o = np.asarray(origins).reshape(-1, 3)
        d = np.asarray(dirs).reshape(-1, 3)
        hit, t0, t1 = (np.asarray(x) for x in intersect.ray_box(
            jnp.asarray(o), jnp.asarray(d)))
        t0 = np.maximum(t0, 0.0)
        S = 4096
        gz, gy, gx = vis.shape
        ref = np.zeros(o.shape[0], np.float32)
        for i in range(o.shape[0]):
            if not hit[i] or t1[i] <= t0[i]:
                continue
            ts = t0[i] + (t1[i] - t0[i]) * (np.arange(S) + 0.5) / S
            p = o[i] + ts[:, None] * d[i]
            c = np.clip((p * [gx, gy, gz]).astype(int), 0,
                        [gx - 1, gy - 1, gz - 1])
            frac = vis[c[:, 2], c[:, 1], c[:, 0]].mean()
            ref[i] = frac * (t1[i] - t0[i])
        np.testing.assert_allclose(imp.reshape(-1), ref, atol=0.02)

    def test_miss_pixels_zero(self):
        vol, tf, mm = _setup()
        # camera far off to the side -> corner pixels miss the box
        cam = Camera.create(eye=(0.5, 0.5, -3.0), fov_y=60.0)
        imp = np.asarray(screen_importance.screen_space_importance(
            mm, tf, cam, width=32, height=32))
        assert imp[0, 0] == 0.0 and imp.max() > 0.0


class TestCellVisibilityMix:
    def test_visible_cells_marked(self):
        vol, tf, mm = _setup()
        cam = Camera.create()
        vis = np.asarray(screen_importance.cell_visibility_from_camera(
            mm, tf, cam))
        assert vis.shape == mm.data.shape[:3]
        assert set(np.unique(vis)).issubset({0.0, 1.0})
        assert vis.max() == 1.0

    def test_build_importance_grid_mix(self):
        vol, tf, mm = _setup()
        tfs = TransferFunction.from_points(
            *synthetic.default_scattering_points())
        scene = Scene.create(vol, tf, tfs,
                             [Light.directional((0.0, -1.0, 0.3))],
                             Camera.create())
        cfg = PipelineConfig(photons_x=8, photons_y=8,
                             render=RenderConfig(width=8, height=8),
                             tracer=TracerConfig())
        base = pstep.build_importance_grid(scene, cfg)
        mixed = pstep.build_importance_grid(scene, cfg,
                                            screen_space_weight=0.5)
        b, m = np.asarray(base.data), np.asarray(mixed.data)
        # mixing never raises importance, and downweights exactly by 1-w
        assert (m <= b + 1e-6).all()
        vis = np.asarray(screen_importance.cell_visibility_from_camera(
            minmax.volume_min_max(vol, cfg.recompute.grid_cell_size),
            tf, scene.camera))
        np.testing.assert_allclose(m, b * (0.5 + 0.5 * vis), rtol=1e-5)
