"""Checkpoint round-trip: a resumed run must continue bit-identically.

The analog of the reference's ``.inv`` workspace serialization (SURVEY §5
checkpoint row), strengthened: the runtime photon state is persisted too,
so resume does not retrace."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import (PipelineConfig, RenderConfig, SplatConfig,
                                 TracerConfig)
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import checkpoint, synthetic
from cpm_tpu.pipeline import step as pstep


def _setup():
    volume = Volume.from_data(synthetic.smoke_cloud(16, seed=2))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(volume, tf, tfs,
                         [Light.directional((0.0, -1.0, 0.3))],
                         Camera.create())
    config = PipelineConfig(
        photons_x=16, photons_y=16,
        tracer=TracerConfig(max_interactions=2, max_steps=800,
                            use_compaction=False,
                            clip_max=(1.0, 1.0, 0.9)),
        splat=SplatConfig(volume_size_from_radius=False, volume_dim=8),
        render=RenderConfig(width=8, height=8))
    return scene, config


def test_roundtrip_bit_identical_resume(tmp_path):
    scene, config = _setup()
    state = pstep.full_trace_step(scene, pstep.init_state(scene, config),
                                  config)
    state = pstep.progressive_step(scene, state, config)

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(path, state, config)
    state2, config2 = checkpoint.load_checkpoint(path)
    assert config2 == config  # configs (incl. clip tuple) round-trip

    # every leaf identical after the round-trip
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the NEXT step from the loaded state is bit-identical
    n1 = pstep.progressive_step(scene, state, config)
    n2 = pstep.progressive_step(scene, state2, config2)
    np.testing.assert_array_equal(np.asarray(n1.light_volume_accum),
                                  np.asarray(n2.light_volume_accum))
    np.testing.assert_array_equal(np.asarray(n1.photons.positions),
                                  np.asarray(n2.photons.positions))
    assert int(n1.photons.iteration) == int(n2.photons.iteration)


def test_leaf_count_mismatch_raises(tmp_path):
    scene, config = _setup()
    state = pstep.init_state(scene, config)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(path, state, config)

    import numpy as _np
    import json as _json
    with _np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    hdr = _json.loads(bytes(arrays["__cpm_header__"].tobytes()).decode())
    hdr["config"]["tracer"]["max_interactions"] = 7  # wrong shape family
    # leaves no longer match a 7-interaction template
    arrays["__cpm_header__"] = _np.frombuffer(
        _json.dumps(hdr).encode(), dtype=_np.uint8)
    _np.savez(path, **arrays)
    try:
        checkpoint.load_checkpoint(path)
    except ValueError:
        pass  # acceptable: explicit failure
    else:
        # loading may also succeed structurally (leaf count is unchanged);
        # then the photon buffer must carry the SAVED interaction shape
        state2, _ = checkpoint.load_checkpoint(path)
        assert state2.photons.positions.shape[0] == 2


def test_extensionless_path_roundtrips(tmp_path):
    """ADVICE round 4: np.savez appends '.npz'; load must find the file."""
    scene, config = _setup()
    state = pstep.init_state(scene, config)
    p = str(tmp_path / "ckpt_noext")
    checkpoint.save_checkpoint(p, state, config)
    state2, config2 = checkpoint.load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(state.photons.positions),
                                  np.asarray(state2.photons.positions))
    assert config2 == config
