"""Pipeline state pytrees: photon-map state and the dirty-flag incremental
engine.

The reference drives incremental recomputation through invalidation flags
accumulated from property/port onChange callbacks
(PhotonData::InvalidationReason, photondata.h:67-74;
progressivephotontracercl.cpp:107-184). Here the flags are an explicit
frozen dataclass: each distinct combination specializes the jitted step —
the analog of the reference's kernel-variant recompiles.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from cpm_tpu.core.types import LightSamples, PhotonData

Array = jax.Array


@dataclass(frozen=True)
class DirtyFlags:
    """What changed since the last step (photondata.h:67-74)."""

    light: bool = False
    camera: bool = False
    tf: bool = False
    volume: bool = False
    progressive: bool = False

    @property
    def resets_iteration(self) -> bool:
        """progressivephotontracercl.cpp:244-252: any of Light/Camera/TF/
        Volume (or nothing at all) restarts the progressive iteration."""
        return (self.light or self.camera or self.tf or self.volume
                or not self.progressive)

    @property
    def any(self) -> bool:
        return (self.light or self.camera or self.tf or self.volume
                or self.progressive)


ALL_DIRTY = DirtyFlags(light=True, camera=True, tf=True, volume=True)


@struct.dataclass
class PhotonMapState:
    """Checkpointable progressive photon-mapping state (SURVEY.md §5:
    iteration, radius, photon buffer and light volume as one pytree)."""

    photons: PhotonData
    light_samples: LightSamples
    light_volume: Array  # (D, H, W, 3) current-iteration irradiance
    light_volume_accum: Array  # (D, H, W, 3) progressive average
    key: Array  # base PRNG key (stream root)
    retraced: Array  # (N,) bool — photons already retraced this drain round
    # (the analog of the reference's resetPhotonImportance sentinel,
    # progressivephotontracercl.cpp:607-611)
    n_remaining: Array  # () int32 — flagged photons not yet retraced
    # Equal-importance round-robin phase, advanced once per correlated
    # step: the analog of PhotonRecomputationDetector's per-call iteration
    # counter (photonrecomputationdetector.cl:160-194). NOT reset by
    # invalidations — its job is coverage rotation across calls.
    recompute_phase: Array = 0
    prev_minmax: Array | None = None  # previous time step's min/max grid
