"""Multi-chip sharding equivalence: the sharded pipeline must produce the
same photons / light volume / image as the single-chip path (up to float-add
reassociation across shards).

Runs in a subprocess with --xla_force_host_platform_device_count=8 so the
main pytest process stays single-device (see conftest.py).
"""

import os
import subprocess
import sys
import textwrap

import pytest

_SCRIPT = textwrap.dedent("""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from cpm_tpu.core.camera import Camera
    from cpm_tpu.core.config import PipelineConfig, RenderConfig, TracerConfig
    from cpm_tpu.core.lights import Light
    from cpm_tpu.core.scene import Scene
    from cpm_tpu.core.types import TransferFunction, Volume
    from cpm_tpu.io import synthetic
    from cpm_tpu.parallel import sharding as psh
    from cpm_tpu.pipeline import step as pstep

    assert len(jax.devices()) == 8, jax.devices()

    vol = Volume.from_data(synthetic.sphere_in_box(32))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(vol, tf, tfs, [Light.directional((0, -1, 0.3))],
                         Camera.create())
    cfg = PipelineConfig(photons_x=32, photons_y=32,
                         tracer=TracerConfig(max_interactions=2, max_steps=3000),
                         render=RenderConfig(width=32, height=32))

    st = pstep.init_state(scene, cfg)
    mesh = psh.make_mesh()
    st_sh = st.replace(
        light_samples=psh.shard_light_samples(st.light_samples, mesh))
    st2, img2 = psh.sharded_full_step(scene, st_sh, cfg, mesh)

    st1 = pstep.full_trace_step(scene, st, cfg)
    img1 = pstep.render_state(scene, st1, cfg)

    lv1, lv2 = np.asarray(st1.light_volume), np.asarray(st2.light_volume)
    np.testing.assert_allclose(lv2, lv1, rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img1),
                               rtol=2e-3, atol=1e-3)

    # Determinism: the sharded step is bit-reproducible run-to-run.
    st3, img3 = psh.sharded_full_step(scene, st_sh, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(st3.light_volume), lv2)

    # Photon trajectories are invariant to shard layout (global lane-id RNG):
    # valid (non-sentinel) photon positions agree with the single-chip trace.
    p1 = np.asarray(st1.photons.positions)
    p2 = np.asarray(st2.photons.positions)
    valid = (p1 < 1e30) & (p2 < 1e30)
    np.testing.assert_allclose(np.where(valid, p1, 0), np.where(valid, p2, 0),
                               atol=1e-5)
    print("SHARDING_OK")
""")


@pytest.mark.slow
def test_sharded_equivalence_8dev():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "SHARDING_OK" in res.stdout


@pytest.mark.slow
def test_graft_entry_dryrun():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["JAX_PLATFORMS"] = "cpu"
    script = ("import jax; jax.config.update('jax_platforms', 'cpu');"
              "import __graft_entry__ as g; g.dryrun_multichip(8);"
              "fn, args = g.entry(); jax.block_until_ready(fn(*args));"
              "print('GRAFT_OK')")
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert res.returncode == 0, res.stdout + res.stderr
    assert "GRAFT_OK" in res.stdout
