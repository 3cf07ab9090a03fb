"""Multi-chip distribution of the photon-mapping pipeline.

The reference is a single-GPU app (SURVEY.md §2.9: no MPI/NCCL anywhere);
this layer is the *new* TPU-native capability: SPMD over a
``jax.sharding.Mesh`` with XLA collectives riding the ICI.

Sharding design (jax-ml.github.io/scaling-book recipe):
- mesh axis ``"data"``: photons / light samples / camera pixels are sharded
  on their leading axis — pure data parallelism, zero communication during
  the trace and ray-march loops.
- the light volume is small (~65^3 x 3 floats ≈ 3 MB); every shard splats
  its photon slice into a *private* partial grid and one ``psum`` over
  ``"data"`` reduces them. Because the scatter-add inside each shard is a
  deterministic segment reduction (no atomics) and psum has a fixed
  reduction order over the mesh, the sharded grid is bit-reproducible and
  equal to the single-chip grid up to float-add reassociation across shards
  (tests assert allclose at 1e-5).
- RNG streams are keyed by *global* lane id (``jax.random.fold_in``), so
  photon trajectories are invariant to how lanes are laid out across chips
  — the TPU analog of MWC64X skip-ahead stream splitting
  (reference: modules/rndgenmwc64x/cl/randstategen.cl:39-48).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cpm_tpu.core.config import PipelineConfig
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import LightSamples, PhotonData, TransferFunction, Volume
from cpm_tpu.ops import gather, splat, tracer
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.pipeline.state import PhotonMapState

Array = jax.Array

try:  # jax >= 0.4.31 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # noqa: F401
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_light_samples(ls: LightSamples, mesh: Mesh,
                        axis_name: str = "data") -> LightSamples:
    """Lay the light-sample bundle out shard-major over the mesh."""
    sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    return LightSamples(
        origins=jax.device_put(ls.origins, sh),
        directions=jax.device_put(ls.directions, sh),
        powers=jax.device_put(ls.powers, sh),
        tspan=jax.device_put(ls.tspan, sh),
        iteration=jax.device_put(ls.iteration, rep),
    )


@partial(jax.jit, static_argnames=("config", "out_dim", "footprint",
                                   "method", "mesh", "axis_name"))
def sharded_trace_splat(volume: Volume, tf: TransferFunction,
                        tf_scattering: TransferFunction,
                        light_samples: LightSamples, key: Array,
                        config, out_dim: tuple, footprint: int, method: str,
                        mesh: Mesh, axis_name: str = "data"):
    """Trace photons sharded over ``axis_name`` and reduce per-shard splat
    grids with one psum.

    Returns (photons sharded over lanes, replicated (D,H,W,3) light volume).
    ``config`` is a TracerConfig; ``footprint`` is the validated splat
    footprint from :func:`cpm_tpu.pipeline.step.splat_footprint` so the
    sharded grid matches the single-chip result for any config.
    """
    n = light_samples.n
    n_shards = mesh.shape[axis_name]
    assert n % n_shards == 0, (n, n_shards)
    per = n // n_shards

    ls_spec = LightSamples(
        origins=P(axis_name), directions=P(axis_name), powers=P(axis_name),
        tspan=P(axis_name), iteration=P())

    def shard_fn(ls_shard: LightSamples, key_rep: Array):
        shard_id = jax.lax.axis_index(axis_name)
        lane_ids = shard_id * per + jnp.arange(per, dtype=jnp.int32)
        photons = tracer.trace_photons(
            volume, tf, tf_scattering, ls_shard, key_rep, config,
            lane_ids=lane_ids)
        # Per-shard partial grid; scale must use the GLOBAL photon count.
        partial_lv = splat.splat_all(photons, out_dim, footprint=footprint,
                                     n_total=n, method=method)
        lv = jax.lax.psum(partial_lv, axis_name)
        return photons, lv

    photon_spec = PhotonData(
        positions=P(None, axis_name), powers=P(None, axis_name),
        directions=P(None, axis_name), exit_power=P(axis_name),
        exit_direction=P(axis_name), radius_rel=P(), scene_radius=P(),
        iteration=P())

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(ls_spec, P()),
        out_specs=(photon_spec, P()),
        check_vma=False,
    )(light_samples, key)


@partial(jax.jit,
         static_argnames=("axis", "sign", "n_planes", "inter_u", "inter_v",
                          "width", "height", "ambient", "mesh", "axis_name"))
def _sharded_sweep_core(vol_data: Array, tf: TransferFunction,
                        light_data: Array, camera, *, axis: int, sign: int,
                        n_planes: int, inter_u: int, inter_v: int,
                        width: int, height: int, ambient: float,
                        mesh: Mesh, axis_name):
    """Shear-warp sweep with the intermediate image column-sharded over the
    mesh: each device runs the full front-to-back plane scan for its
    U-chunk (volume + TF + light volume replicated — they are MBs), then
    the composited intermediate is assembled (one all-gather, ~a few MB)
    and warped to the screen. ``axis_name`` may be a single axis or a tuple
    (multi-host (hosts, chips) meshes shard over both)."""
    from cpm_tpu.ops import sweep_render as sw

    vol_p, light_p = sw.permute_volumes(vol_data, light_data, axis)
    sched = sw._plane_schedule(camera, axis, sign, n_planes, width, height)
    u, v = sw.base_grid(sched, inter_u, inter_v)

    def scan_shard(u_chunk):
        return sw._scan_planes(vol_p, light_p, tf, sched, u_chunk, v,
                               ambient)

    inter = shard_map(
        scan_shard, mesh=mesh,
        in_specs=(P(axis_name),),
        out_specs=P(None, axis_name, None),
        check_vma=False,
    )(u)
    # The warp reads arbitrary intermediate columns -> XLA inserts the
    # all-gather of `inter` here; the per-pixel work itself is trivial.
    return sw._warp(inter, sched, axis, width, height)


def sharded_sweep_render(volume: Volume, tf: TransferFunction,
                         light_volume: Array, camera, config,
                         mesh: Mesh, axis_name="data") -> Array:
    """Multi-chip shear-warp render (production path); see
    :func:`_sharded_sweep_core`. ``config`` is a RenderConfig."""
    from cpm_tpu.ops import sweep_render as sw

    axis, sign = sw.principal_axis(camera)
    na = volume.data.shape[2 - axis]
    n_planes = max(2, int(na * config.sampling_rate))
    n_shards = int(np.prod([mesh.shape[a] for a in (
        axis_name if isinstance(axis_name, tuple) else (axis_name,))]))
    U = sw._round_up(int(config.width * config.inter_scale), 128)
    U = sw._round_up(U, n_shards)
    V = sw._round_up(int(config.height * config.inter_scale), 128)
    return _sharded_sweep_core(
        volume.data, tf, light_volume, camera, axis=axis, sign=sign,
        n_planes=n_planes, inter_u=U, inter_v=V, width=config.width,
        height=config.height, ambient=config.ambient, mesh=mesh,
        axis_name=axis_name)


@partial(jax.jit, static_argnames=("n_steps", "ambient", "mesh", "axis_name"))
def sharded_render_rays(volume: Volume, tf: TransferFunction,
                        light_volume: Array, o: Array, d: Array,
                        n_steps: int, ambient: float, mesh: Mesh,
                        axis_name: str = "data") -> Array:
    """Ray-march with the pixel bundle sharded over the mesh; the volume, TF
    and light volume are replicated (they are small — the camera loop is
    compute-bound)."""
    def shard_fn(o_s, d_s):
        return gather.render_rays(volume, tf, light_volume, o_s, d_s,
                                  n_steps, ambient)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )(o, d)


def sharded_full_step(scene: Scene, state: PhotonMapState,
                      config: PipelineConfig, mesh: Mesh,
                      axis_name: str = "data"):
    """One full pipeline step (trace -> splat-psum -> render) over the mesh.

    The multi-chip analog of :func:`cpm_tpu.pipeline.step.full_trace_step`
    followed by :func:`render_state`; returns (new state, (H, W, 4) image).
    """
    key = jax.random.fold_in(state.key, 0)
    dim = pstep.light_volume_shape(config)
    photons, lv = sharded_trace_splat(
        scene.volume, scene.tf, scene.tf_scattering, state.light_samples,
        key, config.tracer, dim, pstep.splat_footprint(config),
        pstep.splat_method(config), mesh, axis_name)
    photons = photons.replace(
        radius_rel=jnp.float32(config.tracer.radius_rel),
        scene_radius=scene.volume.scene_radius(),
        iteration=jnp.int32(0))
    state = state.replace(photons=photons, light_volume=lv,
                          light_volume_accum=lv,
                          retraced=jnp.zeros(photons.n, bool),
                          n_remaining=jnp.int32(0))

    if config.render.method == "sweep":
        img = sharded_sweep_render(scene.volume, scene.tf, lv, scene.camera,
                                   config.render, mesh, axis_name)
        return state, img
    h, w = config.render.height, config.render.width
    origins, dirs = scene.camera.rays(w, h)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    dim_max = max(scene.volume.data.shape)
    n_steps = int(3 ** 0.5 * dim_max * config.render.sampling_rate) + 1
    img = sharded_render_rays(scene.volume, scene.tf, lv, o, d, n_steps,
                              config.render.ambient, mesh, axis_name)
    return state, img.reshape(h, w, 4)
