import time, sys
import jax, jax.numpy as jnp, numpy as np
from cpm_tpu.core.config import PipelineConfig, RenderConfig, TracerConfig
from cpm_tpu.core.camera import Camera
from cpm_tpu.core.lights import Light
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.ops import tracer, splat

volume = Volume.from_data(synthetic.smoke_cloud(128, seed=3))
tf = TransferFunction.from_points(*synthetic.default_tf_points())
tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
scene = Scene.create(volume, tf, tfs, [Light.directional((0.0,-1.0,0.3))], Camera.create())
config = PipelineConfig(photons_x=256, photons_y=256,
                        tracer=TracerConfig(max_interactions=4, max_steps=6000),
                        render=RenderConfig(width=512, height=512))
state = pstep.init_state(scene, config)
ph = tracer.trace_photons(scene.volume, tf, tfs, state.light_samples, jax.random.fold_in(state.key,0), config.tracer)
jax.block_until_ready(ph.positions)
dim = pstep.light_volume_shape(config)

def timeit(name, f, *args, reps=5):
    out = f(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args); _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", file=sys.stderr)
    return out

a = timeit("splat pallas (1024x512 tiles)", lambda: splat.splat_all(ph, dim, method="pallas"))
b = timeit("splat matmul", lambda: splat.splat_all(ph, dim, method="matmul"))
print("pallas vs matmul max rel diff:",
      float(jnp.max(jnp.abs(a-b))/(jnp.max(jnp.abs(b))+1e-9)), file=sys.stderr)
