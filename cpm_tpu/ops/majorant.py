"""Per-macrocell extinction majorants for Woodcock tracking.

The reference bounds Woodcock trip counts with a single global majorant
(``tau_max = 1.0``) and a commented-out ``skipEmptySpace`` empty-space walk
(modules/progressivephotonmapping/cl/transmittance.cl:267-283 and
cl/photontracer.cl:141-142). That global bound is the direct cause of
thousands of rejection steps in sparse volumes (VERDICT.md "What's missing"
#3): the expected number of Woodcock iterations is sigma_majorant * path
length, regardless of the actual opacity.

TPU-native redesign: a *macrocell majorant grid* — per 8^3-voxel cell, the
maximum TF opacity reachable for data values inside the cell's (dilated)
[min, max] range. The tracer then samples free flights against the LOCAL
majorant and jumps zero-majorant cells to their exit boundary in one
wavefront iteration (spatially varying delta tracking, the standard
macrocell formulation). The per-cell range-max over the TF is one gather
into a precomputed (K, K) range-max table; everything is dense vector work.

Conservativeness:
- min/max grids are dilated by one full cell (3^3 min/max pooling) so
  trilinear interpolation across cell borders stays inside the bound;
- the per-cell range max is computed EXACTLY over the piecewise-linear
  point-list TF (endpoint values + interior control points), the same
  function ``TransferFunction.sample`` evaluates in the tracer hot loop —
  so opacity(v) <= majorant holds exactly for any v in [vmin, vmax].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cpm_tpu.core.types import TransferFunction, Volume

Array = jnp.ndarray


def opacity_range_max_table(lut_opacity: Array) -> Array:
    """(K, K) table T[i, j] = max(lut_opacity[i..j]) (j >= i; garbage below
    the diagonal). One cummax over a masked broadcast."""
    k = lut_opacity.shape[0]
    rows = jnp.arange(k)[:, None]
    cols = jnp.arange(k)[None, :]
    masked = jnp.where(cols >= rows, lut_opacity[None, :], -jnp.inf)
    return jax.lax.cummax(masked, axis=1)


def opacity_range_max(tf: TransferFunction, lo: Array, hi: Array) -> Array:
    """Exact max of the piecewise-linear TF opacity over value range
    [lo, hi] (elementwise over any-shaped lo/hi): the max of a piecewise
    linear function on an interval is attained at an endpoint or at a
    control point inside it. Dense VPU math, no table, no gather."""
    m = jnp.maximum(tf.sample(lo)[..., 3], tf.sample(hi)[..., 3])
    n_pts = tf.positions.shape[0]
    for s in range(n_pts):
        inside = (tf.positions[s] >= lo) & (tf.positions[s] <= hi)
        m = jnp.where(inside, jnp.maximum(m, tf.colors[s, 3]), m)
    return m


def dilate_min_max(mins: Array, maxs: Array) -> tuple[Array, Array]:
    """3^3 stride-1 min/max pooling: bounds valid for trilinear samples up to
    one cell past the border."""
    window = (3, 3, 3)
    strides = (1, 1, 1)
    mins_d = -jax.lax.reduce_window(-mins, jnp.float32(-jnp.inf), jax.lax.max,
                                    window, strides, "SAME")
    maxs_d = jax.lax.reduce_window(maxs, jnp.float32(-jnp.inf), jax.lax.max,
                                   window, strides, "SAME")
    return mins_d, maxs_d


@partial(jax.jit, static_argnames=("cell_size",))
def build_majorant_grid(volume: Volume, tf: TransferFunction,
                        cell_size: int = 8) -> Array:
    """(gz, gy, gx) per-cell majorant OPACITY (multiply by
    SAMPLING_BASE_INTERVAL_RCP for extinction): max TF opacity over the
    dilated per-cell data range. Zero cells are skippable empty space."""
    from cpm_tpu.ops import minmax as minmax_mod

    mm = minmax_mod.volume_min_max(volume, cell_size)
    mins, maxs = dilate_min_max(mm.data[..., 0], mm.data[..., 1])
    return jnp.maximum(opacity_range_max(tf, mins, maxs), 0.0)


def cell_exit_distance(origin: Array, direction: Array, cell: Array,
                       grid_dim: Array) -> Array:
    """Ray parameter t at which ``origin + t*direction`` exits macrocell
    ``cell`` (int xyz), cells spanning [c/g, (c+1)/g] per axis. The 3D-DDA
    boundary step of uniformgrid.cl:82-197, evaluated analytically per
    wavefront iteration instead of with persistent traversal state."""
    face = (cell.astype(jnp.float32)
            + (direction > 0.0).astype(jnp.float32)) / grid_dim
    t_face = jnp.where(jnp.abs(direction) > 1e-12,
                       (face - origin) / direction, jnp.inf)
    return jnp.min(t_face, axis=-1)
