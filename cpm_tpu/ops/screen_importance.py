"""Screen-space (camera-visibility) importance: per-pixel DDA through the
min/max grid between camera entry/exit points.

Reference parity: the standalone helper ``MinMaxUniformGrid3DImportanceCL``
(modules/importancesamplingcl/minmaxuniformgrid3dimportancecl.cpp:49-135)
driving ``uniformGridImportanceKernel``
(cl/minmaxuniformgrid3dimportance.cl:85-129, 336-378): for every image
pixel, march the ray from the volume entry to the exit point through the
min/max uniform grid and accumulate the t-coverage of every cell whose
[min, max] data range overlaps the visible threshold window, scaled by the
segment length. The threshold window comes from the TF end points
(minmaxuniformgrid3dimportancecl.cpp:103-106): an end point with zero alpha
pushes the window edge inward to its position.

TPU-first: the per-pixel DDA reuses the vectorized Amanatides-Woo
fori_loop (:func:`cpm_tpu.ops.path_importance.grid_segment_integral`)
over a binary visibility grid; the optional cell-space term for the
importance mix scatters the per-pixel visibility back into grid cells.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.types import TransferFunction, UniformGrid3D
from cpm_tpu.ops import intersect
from cpm_tpu.ops.path_importance import grid_segment_integral

Array = jnp.ndarray


def data_threshold_from_tf(tf: TransferFunction) -> Array:
    """(2,) visible data window [lo, hi]: a TF end point with alpha == 0
    moves the edge to its position (minmaxuniformgrid3dimportancecl.cpp:
    103-106 ``transferFunctionMaxMin``)."""
    lo = jnp.where(tf.colors[0, 3] > 0.0, 0.0, tf.positions[0])
    hi = jnp.where(tf.colors[-1, 3] > 0.0, 1.0, tf.positions[-1])
    return jnp.stack([lo, hi])


def visibility_grid(minmax: UniformGrid3D, threshold: Array) -> Array:
    """(gz, gy, gx) binary grid: 1 where the cell's data range overlaps the
    visible window (``classifyMinMaxImportance``, cl:131-137)."""
    mins = minmax.data[..., 0]
    maxs = minmax.data[..., 1]
    culled = (maxs < threshold[0]) | (mins > threshold[1])
    return jnp.where(culled, 0.0, 1.0)


@partial(jax.jit, static_argnames=("width", "height", "max_steps"))
def screen_space_importance(minmax: UniformGrid3D, tf: TransferFunction,
                            camera: Camera, width: int = 128,
                            height: int = 128,
                            max_steps: int = 96) -> Array:
    """(height, width) per-pixel importance: visible-cell t-coverage along
    the entry->exit segment, scaled by segment length (the EntryExitPoints
    textures become an analytic ray-box clip here)."""
    origins, dirs = camera.rays(width, height)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    hit, t0, t1 = intersect.ray_box(o, d)
    t0 = jnp.maximum(t0, 0.0)
    entry = o + t0[:, None] * d
    exit_ = o + t1[:, None] * d
    vol_dim = minmax.volume_dim  # (3,) voxels x,y,z
    x1 = entry * vol_dim
    x2 = exit_ * vol_dim
    vis = visibility_grid(minmax, data_threshold_from_tf(tf))
    imp = grid_segment_integral(vis, x1, x2, minmax.cell_dim,
                                max_steps=max_steps)
    # Length scale in TEXTURE space like the reference's indexToTexture
    # transform (cl:105), not voxel space: redo the scale.
    len_idx = jnp.linalg.norm(x2 - x1, axis=-1)
    len_tex = jnp.linalg.norm(exit_ - entry, axis=-1)
    imp = jnp.where(hit & (len_idx > 1e-12),
                    imp * len_tex / jnp.maximum(len_idx, 1e-12), 0.0)
    return imp.reshape(height, width)


@partial(jax.jit, static_argnames=("width", "height", "n_steps"))
def cell_visibility_from_camera(minmax: UniformGrid3D, tf: TransferFunction,
                                camera: Camera, width: int = 64,
                                height: int = 64,
                                n_steps: int = 64) -> Array:
    """(gz, gy, gx) in [0, 1]: fraction-of-coverage term for the importance
    mix — 1 for visible cells actually crossed by camera rays, 0 elsewhere.

    The cell-space dual of :func:`screen_space_importance`: camera rays are
    marched with fixed steps and visited cells marked (scatter-max), then
    gated by the data-visibility classify.
    """
    gz, gy, gx = minmax.data.shape[:3]
    gdim = jnp.array([gx, gy, gz], jnp.float32)
    origins, dirs = camera.rays(width, height)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    hit, t0, t1 = intersect.ray_box(o, d)
    t0 = jnp.maximum(t0, 0.0)
    ts = t0[:, None] + (t1 - t0)[:, None] * (
        (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps)[None, :]
    p = o[:, None, :] + ts[..., None] * d[:, None, :]  # (P, S, 3)
    cell = jnp.clip(jnp.floor(p * gdim), 0.0, gdim - 1.0).astype(jnp.int32)
    flat = (cell[..., 2] * gy + cell[..., 1]) * gx + cell[..., 0]
    flat = jnp.where(hit[:, None], flat, gx * gy * gz)
    covered = jnp.zeros(gx * gy * gz + 1, jnp.float32)
    covered = covered.at[flat.reshape(-1)].max(1.0, mode="drop")
    covered = covered[:-1].reshape(gz, gy, gx)
    return covered * visibility_grid(minmax, data_threshold_from_tf(tf))
