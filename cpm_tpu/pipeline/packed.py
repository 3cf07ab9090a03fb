"""Packed interactive frame: the whole correlated-update + render loop as
ONE low-leaf-count dispatch.

Why this exists: on dispatch-latency-bound deployments (measured on the
axon v5e tunnel: ~0.4 ms per pytree LEAF per direction, so the ~19-leaf
:class:`PhotonMapState` costs ~19 ms of pure dispatch tax per host call),
the interactive loop should (a) cross the host boundary once per frame,
not once per stage, and (b) carry few, large buffers. This module packs
the state into 7 leaves and fuses correlated update + sweep render into a
single jit — the analog of the reference enqueueing its whole per-frame
kernel chain on one OpenCL command queue with a single finish()
(progressivephotontracercl.cpp:265-605).

The camera's dominant axis stays a static specialization (recompiles on
axis flips, exactly like the sweep renderer and the reference's
kernel-define recompiles).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import PipelineConfig
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import LightSamples, PhotonData, UniformGrid3D
from cpm_tpu.pipeline import step as step_mod
from cpm_tpu.pipeline.state import PhotonMapState

Array = jnp.ndarray


class PackedState(NamedTuple):
    """7-leaf packing of :class:`PhotonMapState` (plus the RNG key)."""

    photon_soa: Array  # (I, N, 8) f32: pos3 | pow3 | dir2
    photon_exit: Array  # (N, 3) f32: exit_power | exit_dir2
    ls_soa: Array  # (N, 11) f32: origins3 | dirs3 | powers3 | tspan2
    light_volume: Array  # (D, H, W, 3)
    retraced: Array  # (N,) bool
    misc: Array  # (6,) f32: radius_rel, scene_radius, iteration,
    #                        n_remaining, recompute_phase, ls_iteration
    key: Array  # (2,) uint32


def pack_state(state: PhotonMapState) -> PackedState:
    ph = state.photons
    soa = jnp.concatenate([
        ph.positions.astype(jnp.float32), ph.powers.astype(jnp.float32),
        ph.directions.astype(jnp.float32)], axis=-1)
    exits = jnp.concatenate([
        ph.exit_power[:, None].astype(jnp.float32),
        ph.exit_direction.astype(jnp.float32)], axis=-1)
    ls = state.light_samples
    ls_soa = jnp.concatenate(
        [ls.origins, ls.directions, ls.powers, ls.tspan], axis=-1)
    misc = jnp.stack([
        ph.radius_rel.astype(jnp.float32),
        ph.scene_radius.astype(jnp.float32),
        ph.iteration.astype(jnp.float32),
        state.n_remaining.astype(jnp.float32),
        state.recompute_phase.astype(jnp.float32),
        ls.iteration.astype(jnp.float32)])
    return PackedState(photon_soa=soa, photon_exit=exits, ls_soa=ls_soa,
                       light_volume=state.light_volume,
                       retraced=state.retraced, misc=misc, key=state.key)


def unpack_state(p: PackedState, photon_dtype=jnp.float32) -> PhotonMapState:
    soa = p.photon_soa
    photons = PhotonData(
        positions=soa[..., 0:3].astype(photon_dtype),
        powers=soa[..., 3:6].astype(photon_dtype),
        directions=soa[..., 6:8].astype(photon_dtype),
        exit_power=p.photon_exit[:, 0],
        exit_direction=p.photon_exit[:, 1:3],
        radius_rel=p.misc[0],
        scene_radius=p.misc[1],
        iteration=p.misc[2].astype(jnp.int32))
    ls = LightSamples(
        origins=p.ls_soa[:, 0:3], directions=p.ls_soa[:, 3:6],
        powers=p.ls_soa[:, 6:9], tspan=p.ls_soa[:, 9:11],
        iteration=p.misc[5].astype(jnp.int32))
    return PhotonMapState(
        photons=photons, light_samples=ls,
        light_volume=p.light_volume, light_volume_accum=p.light_volume,
        key=p.key, retraced=p.retraced,
        n_remaining=p.misc[3].astype(jnp.int32),
        recompute_phase=p.misc[4].astype(jnp.int32))


@partial(jax.jit,
         static_argnames=("config", "budget", "axis", "sign", "fresh_round",
                          "do_render"))
def _frame_impl(scene: Scene, packed: PackedState, camera: Camera,
                imp_grid: UniformGrid3D, config: PipelineConfig,
                budget: int, axis: int, sign: int, fresh_round: bool,
                do_render: bool):
    from cpm_tpu.ops import sweep_render as sw

    state = unpack_state(packed)
    if fresh_round:
        state = state.replace(retraced=jnp.zeros_like(state.retraced),
                              n_remaining=jnp.int32(0))
    state = state.replace(key=jax.random.fold_in(state.key, 1))
    state = step_mod.correlated_step(scene, state, config, imp_grid, budget)

    if not do_render:
        return pack_state(state), jnp.zeros((0, 0, 4), jnp.float32)
    rcfg = config.render
    na = scene.volume.data.shape[2 - axis]
    n_planes = max(2, int(na * rcfg.sampling_rate))
    U = sw._round_up(int(rcfg.width * rcfg.inter_scale), 128)
    V = sw._round_up(int(rcfg.height * rcfg.inter_scale), 128)
    img, _, _ = sw._sweep_core(
        scene.volume.data, scene.tf, state.light_volume_accum, camera,
        axis=axis, sign=sign, n_planes=n_planes, inter_u=U, inter_v=V,
        width=rcfg.width, height=rcfg.height, ambient=rcfg.ambient)
    return pack_state(state), img


def interactive_frame(scene: Scene, packed: PackedState, camera: Camera,
                      imp_grid: UniformGrid3D, config: PipelineConfig,
                      budget: int, fresh_round: bool = False,
                      do_render: bool = True):
    """One interactive frame: correlated update + sweep render, one
    dispatch in / one out. ``fresh_round=True`` restarts the drain round
    (a new TF/volume invalidation); ``do_render=False`` runs just the
    packed correlated update (an empty image is returned). Returns
    (packed_state', image)."""
    from cpm_tpu.ops import sweep_render as sw

    axis, sign = sw.principal_axis(camera)
    return _frame_impl(scene, packed, camera, imp_grid, config, budget,
                       axis, sign, fresh_round, do_render)
