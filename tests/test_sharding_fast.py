"""Default-cadence multi-device test (VERDICT r4 weak #7): a 2-device
sharded-vs-single equivalence that runs in the ordinary (not slow) suite,
so ``pytest -m "not slow"`` exercises shard_map + psum on every run.

Runs in a subprocess with --xla_force_host_platform_device_count=2 (two
virtual devices keep thread contention negligible on this 2-core box,
unlike the 8-device variants which stay slow-marked)."""

import os
import subprocess
import sys
import textwrap

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

    assert len(jax.devices()) == 2, jax.devices()

    vol = Volume.from_data(synthetic.sphere_in_box(16))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    scene = Scene.create(vol, tf, tfs, [Light.directional((0, -1, 0.3))],
                         Camera.create())
    cfg = PipelineConfig(photons_x=16, photons_y=16,
                         tracer=TracerConfig(max_interactions=2,
                                             max_steps=1200),
                         render=RenderConfig(width=16, height=16))

    st = pstep.init_state(scene, cfg)
    mesh = psh.make_mesh()
    st_sh = st.replace(
        light_samples=psh.shard_light_samples(st.light_samples, mesh))
    st2, img2 = psh.sharded_full_step(scene, st_sh, cfg, mesh)

    st1 = pstep.full_trace_step(scene, st, cfg)
    img1 = pstep.render_state(scene, st1, cfg)

    np.testing.assert_allclose(np.asarray(st2.light_volume),
                               np.asarray(st1.light_volume),
                               rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img1),
                               rtol=2e-3, atol=1e-3)
    print("OK2DEV")
""")


def test_two_device_sharded_equals_single():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2")
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert res.returncode == 0, res.stderr[-4000:]
    assert "OK2DEV" in res.stdout
