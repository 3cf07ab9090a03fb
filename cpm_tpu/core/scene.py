"""Scene container: everything the pipeline consumes.

The analog of the reference's processor-network inputs (volume port, TF
property, light sources, camera) collected into one pytree + static config.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.types import TransferFunction, Volume


@struct.dataclass
class Scene:
    volume: Volume
    tf: TransferFunction
    tf_scattering: TransferFunction
    camera: Camera
    # Lights are host-side static objects (light-plane fitting runs on CPU,
    # like the reference's convex-hull/OBB code); stored as aux data.
    lights: Any = struct.field(pytree_node=False, default=())

    @classmethod
    def create(cls, volume: Volume, tf: TransferFunction,
               tf_scattering: TransferFunction, lights: Sequence,
               camera: Camera | None = None) -> "Scene":
        if camera is None:
            camera = Camera.create()
        return cls(volume=volume, tf=tf, tf_scattering=tf_scattering,
                   camera=camera, lights=tuple(lights))
