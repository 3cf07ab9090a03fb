"""Staged active-lane compaction is bit-identical to the plain wavefront.

The compaction schedule (ops/tracer.py:_stage_widths) only changes WHERE an
active lane's state lives, never its RNG stream (keyed by lane id + global
step) or its update order, so every photon's full path must match exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import PipelineConfig, TracerConfig
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import tracer
from cpm_tpu.pipeline import step as pstep


def _setup(n_side=128):
    volume = Volume.from_data(synthetic.sphere_in_box(32))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(volume, tf, tfs,
                         [Light.directional((0.2, -1.0, 0.4))],
                         Camera.create())
    config = PipelineConfig(photons_x=n_side, photons_y=n_side)
    ls = pstep.emit_all(scene, config, jax.random.PRNGKey(3))
    return scene, ls


def test_compaction_bit_identical():
    scene, ls = _setup(128)  # 16384 photons -> stages [16384, 4096]
    key = jax.random.PRNGKey(11)
    base = dict(max_interactions=3, max_steps=4000)
    ph_plain = tracer.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, ls, key,
        TracerConfig(**base, use_compaction=False))
    ph_comp = tracer.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, ls, key,
        TracerConfig(**base, use_compaction=True))
    for field in ("positions", "powers", "directions", "exit_power",
                  "exit_direction"):
        a = np.asarray(getattr(ph_plain, field))
        b = np.asarray(getattr(ph_comp, field))
        np.testing.assert_array_equal(a, b, err_msg=field)


def test_stage_widths_schedule():
    assert tracer._stage_widths(65536, True) == [65536, 16384, 4096]
    assert tracer._stage_widths(65536, False) == [65536]
    assert tracer._stage_widths(4096, True) == [4096]
    assert tracer._stage_widths(1 << 22, True) == [1 << 22, 1 << 20, 1 << 18,
                                                   1 << 16]
