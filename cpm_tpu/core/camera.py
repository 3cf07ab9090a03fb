"""Pinhole camera (the analog of Inviwo's CameraProperty +
EntryExitPoints/CubeProxyGeometry pair: it generates entry/exit spans of
camera rays against the volume's bounding box in texture space).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


@struct.dataclass
class Camera:
    eye: Array  # (3,) texture-space position
    center: Array  # (3,) look-at point
    up: Array  # (3,)
    fov_y: Array  # () degrees

    @classmethod
    def create(cls, eye=(0.5, 0.5, -1.5), center=(0.5, 0.5, 0.5),
               up=(0.0, 1.0, 0.0), fov_y=45.0) -> "Camera":
        return cls(eye=jnp.asarray(eye, jnp.float32),
                   center=jnp.asarray(center, jnp.float32),
                   up=jnp.asarray(up, jnp.float32),
                   fov_y=jnp.float32(fov_y))

    def rays(self, width: int, height: int):
        """Per-pixel ray origins and directions, (H, W, 3) each."""
        fwd = self.center - self.eye
        fwd = fwd / jnp.linalg.norm(fwd)
        right = jnp.cross(fwd, self.up)
        right = right / jnp.linalg.norm(right)
        up = jnp.cross(right, fwd)

        aspect = width / height
        tan_half = jnp.tan(jnp.deg2rad(self.fov_y) * 0.5)
        ys = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
        xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
        px = (2.0 * xs - 1.0) * tan_half * aspect
        py = (1.0 - 2.0 * ys) * tan_half
        d = (fwd[None, None, :]
             + right[None, None, :] * px[None, :, None]
             + up[None, None, :] * py[:, None, None])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(self.eye, d.shape)
        return o, d
