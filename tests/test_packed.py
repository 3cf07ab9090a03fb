"""Packed-state interactive frame == unpacked correlated step + render.

The 7-leaf packing (pipeline/packed.py) exists to beat per-leaf dispatch
latency; it must be a pure re-layout — bit-identical state round-trip and
the fused frame must match the stagewise pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import (PipelineConfig, RecomputeConfig,
                                 RenderConfig, TracerConfig)
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.pipeline import packed as packed_mod
from cpm_tpu.pipeline import step as pstep


def _setup():
    vol = Volume.from_data(synthetic.sphere_in_box(32))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(vol, tf, tfs,
                         [Light.directional((0.0, -1.0, 0.3))],
                         Camera.create())
    cfg = PipelineConfig(
        photons_x=32, photons_y=32,
        tracer=TracerConfig(max_interactions=2, max_steps=3000),
        render=RenderConfig(width=32, height=32),
        recompute=RecomputeConfig(max_photons_fraction=0.1))
    st = pstep.full_trace_step(scene, pstep.init_state(scene, cfg), cfg)
    return scene, cfg, st


def test_pack_unpack_roundtrip_bit_identical():
    scene, cfg, st = _setup()
    st2 = packed_mod.unpack_state(packed_mod.pack_state(st))
    for name in ("positions", "powers", "directions", "exit_power",
                 "exit_direction"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st.photons, name)),
            np.asarray(getattr(st2.photons, name)), err_msg=name)
    np.testing.assert_array_equal(np.asarray(st.light_volume),
                                  np.asarray(st2.light_volume))
    np.testing.assert_array_equal(np.asarray(st.retraced),
                                  np.asarray(st2.retraced))
    np.testing.assert_array_equal(np.asarray(st.key), np.asarray(st2.key))
    assert int(st.n_remaining) == int(st2.n_remaining)


def test_fused_frame_matches_stagewise():
    scene, cfg, st = _setup()
    ig = pstep.build_importance_grid(scene, cfg)
    budget = pstep.recompute_budget(cfg, st.photons.n)

    # Stagewise reference: same key advance as the fused frame applies.
    ref_state = pstep.correlated_step(
        scene, st.replace(key=jax.random.fold_in(st.key, 1)), cfg, ig,
        budget)
    ref_img = pstep.render_state(scene, ref_state, cfg)

    p2, img = packed_mod.interactive_frame(
        scene, packed_mod.pack_state(st), scene.camera, ig, cfg, budget,
        fresh_round=True)
    got_state = packed_mod.unpack_state(p2)
    np.testing.assert_allclose(np.asarray(got_state.light_volume),
                               np.asarray(ref_state.light_volume),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got_state.photons.positions),
        np.asarray(ref_state.photons.positions))
