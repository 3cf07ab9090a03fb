"""Min/max uniform grid construction from a volume.

Reference parity: ``volumeMinMaxKernel``
(modules/uniformgridcl/cl/uniformgrid/volumeminmax.cl:32-60) — a 3D grid of
per-cell (min, max) of the normalized voxel values — orchestrated by
VolumeMinMaxCLProcessor (volumeminmaxclprocessor.cpp:149-184, default region
8^3).

TPU-first: the per-cell voxel loops become ``lax.reduce_window`` min/max
pooling, which XLA lowers to tiled vector reductions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cpm_tpu.core.types import UniformGrid3D, Volume

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("cell_size",))
def volume_min_max(volume: Volume, cell_size: int = 8) -> UniformGrid3D:
    """Build a (gz, gy, gx, 2) min/max grid with cells of ``cell_size``^3
    voxels (partial border cells included, like the reference's
    min(start+region, dim) clamp)."""
    data = volume.data
    window = (cell_size,) * 3
    mins = jax.lax.reduce_window(
        data, jnp.float32(jnp.inf), jax.lax.min, window, window, "SAME")
    maxs = jax.lax.reduce_window(
        data, jnp.float32(-jnp.inf), jax.lax.max, window, window, "SAME")
    grid = jnp.stack([mins, maxs], axis=-1)
    d, h, w = data.shape
    return UniformGrid3D(
        data=grid,
        cell_dim=jnp.array([cell_size] * 3, jnp.float32),
        volume_dim=jnp.array([w, h, d], jnp.float32),
    )


@partial(jax.jit, static_argnames=("cell_size",))
def sequence_min_max(volumes: Array, cell_size: int = 8) -> Array:
    """Min/max grids for a whole (T, D, H, W) sequence at once
    (volumeminmaxclprocessor.cpp:93-116 handles sequences by looping;
    here one vmap)."""
    window = (1,) + (cell_size,) * 3
    mins = jax.lax.reduce_window(
        volumes, jnp.float32(jnp.inf), jax.lax.min, window, window, "SAME")
    maxs = jax.lax.reduce_window(
        volumes, jnp.float32(-jnp.inf), jax.lax.max, window, window, "SAME")
    return jnp.stack([mins, maxs], axis=-1)
