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


def dilate_min_max(mins: Array, maxs: Array,
                   rings: int = 1) -> tuple[Array, Array]:
    """(2*rings+1)^3 stride-1 min/max pooling: bounds valid for trilinear
    samples up to ``rings`` cells past the border (must match the tracer's
    block-exit ring)."""
    window = (2 * rings + 1,) * 3
    strides = (1, 1, 1)
    mins_d = -jax.lax.reduce_window(-mins, jnp.float32(-jnp.inf), jax.lax.max,
                                    window, strides, "SAME")
    maxs_d = jax.lax.reduce_window(maxs, jnp.float32(-jnp.inf), jax.lax.max,
                                   window, strides, "SAME")
    return mins_d, maxs_d


@partial(jax.jit, static_argnames=("cell_size", "rings"))
def build_majorant_grid(volume: Volume, tf: TransferFunction,
                        cell_size: int = 8, rings: int = 1) -> Array:
    """(gz, gy, gx) per-cell majorant OPACITY (multiply by
    SAMPLING_BASE_INTERVAL_RCP for extinction): max TF opacity over the
    ``rings``-cell-dilated per-cell data range. Zero cells are skippable
    empty space."""
    from cpm_tpu.ops import minmax as minmax_mod

    mm = minmax_mod.volume_min_max(volume, cell_size)
    mins, maxs = dilate_min_max(mm.data[..., 0], mm.data[..., 1], rings)
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


def block_exit_distance(origin: Array, direction: Array, cell: Array,
                        cell_ext: Array, ring: int = 1) -> Array:
    """Ray parameter t at which the ray exits the (2*ring+1)^3 cell BLOCK
    centered on ``cell``. The per-cell majorant is computed over the
    3^3-dilated data range (:func:`dilate_min_max`), so it legally bounds
    the whole ring-1 block — clamping free flights at the block exit
    instead of the single-cell exit cuts boundary-clamp null events ~3x
    per axis (the dominant iteration count in thin-but-nonzero regions,
    round-4 measurement)."""
    c = cell.astype(jnp.float32)
    face = jnp.where(direction > 0.0,
                     (c + 1.0 + ring) * cell_ext,
                     (c - ring) * cell_ext)
    t_face = jnp.where(jnp.abs(direction) > 1e-12,
                       (face - origin) / direction, jnp.inf)
    return jnp.min(t_face, axis=-1)


def empty_distance_grid(maj: Array, cap: int = 6) -> Array:
    """Chebyshev distance (in cells, CAPPED at ``cap``) from each cell to
    the nearest cell with a nonzero majorant, ERODED by one cell (a 3^3
    min-pool) so that reading a +-1-cell-misquantized neighbor's value
    stays conservative: D_use(c') = min over N(c') of D and c is in N(c'),
    hence D_use(c') <= D(c).

    The classic empty-space-skipping distance map (the reference sketches
    only single-cell skipping, transmittance.cl:267-283): a lane inside an
    empty cell may advance (D_use - 1) * min-cell-extent in one wavefront
    iteration instead of crawling one cell per iteration — the dominant
    iteration count on mostly-empty volumes.

    Why the cap (ADVICE round 4, medium): without it a lane's jump length
    depends on the nearest nonzero cell ANYWHERE in the grid, so a TF edit
    far from a photon's path can shift its RNG phase and silently stale
    unflagged photons in correlated updates. With the cap, D_use(c)
    depends only on majorant values within ``cap + 1`` cells of ``c``
    (cap on D, +1 for the erosion) — a bounded influence radius that
    :func:`cpm_tpu.pipeline.step.recompute_importance` can match by
    dilation when exact drain coverage is requested.
    """
    big = jnp.float32(cap + 1)
    d = jnp.where(maj > 0.0, 0.0, big)

    def min3(x):
        return -jax.lax.reduce_window(
            -x, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME")

    def body(_, x):
        return jnp.minimum(x, min3(x) + 1.0)

    d = jax.lax.fori_loop(0, cap, body, d)
    return jnp.minimum(min3(d), jnp.float32(cap))  # erode + cap
