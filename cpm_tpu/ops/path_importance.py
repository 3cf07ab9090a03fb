"""Photon-path recomputation importance: integrate the importance grid along
each photon's stored path with 3D-DDA grid traversal.

Reference parity:
- DDA setup/step    modules/uniformgridcl/cl/uniformgrid/uniformgrid.cl:38-197
  (setupUniformGridTraversal / stepToNextCellNextHit, Amanatides-Woo)
- path integration  modules/progressivephotonmapping/cl/
  photonrecomputationdetector.cl:55-157 (uniformGridImportance +
  photonRecomputationDetectorKernel, incl. sentinel handling: absorbed paths
  stop, exited paths extend to the box exit along the stored direction)
- equal-importance  photonrecomputationdetector.cl:160-194
  ((photonId + iteration) % (100/percentage) == 0)

TPU-first: the per-thread while-loop DDA becomes a fixed-trip-count
``lax.fori_loop`` with active masks, vectorized over all (lane, segment)
pairs at once. The reference's subtractive uint trick (2^31-1 - 100*imp so
ascending radix sort = descending importance,
photonrecomputationdetector.cl:152-157) is unnecessary here — we sort float
importance keys descending directly.

Note: the reference contains an apparent bug for never-interacting photons
(`exit = tEnd*direction` misses the `origin +`,
photonrecomputationdetector.cl:123); we implement the evidently intended
`origin + tEnd*direction`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cpm_tpu.core.types import (LightSamples, PhotonData, UniformGrid3D,
                                decode_direction)
from cpm_tpu.ops import intersect

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("max_steps",))
def grid_segment_integral(grid: Array, x1: Array, x2: Array, cell_dim: Array,
                          max_steps: int = 96) -> Array:
    """Integral of per-cell grid values along segments, exact DDA.

    Args:
      grid: (gz, gy, gx) cell values.
      x1, x2: (M, 3) segment endpoints in volume *voxel* coordinates (x,y,z).
      cell_dim: (3,) cell size in voxels.
      max_steps: trip-count cap (>= gx+gy+gz for exactness).

    Returns:
      (M,) sum over visited cells of value * (t-coverage), scaled by |x2-x1|
      — the reference's ``importance * len``
      (photonrecomputationdetector.cl:55-90).
    """
    gz, gy, gx = grid.shape
    max_cells = jnp.array([gx, gy, gz], jnp.int32)
    m = x1.shape[0]

    cellf = jnp.clip(jnp.floor(x1 / cell_dim), 0.0,
                     (max_cells - 1).astype(jnp.float32))
    cell = cellf.astype(jnp.int32)
    cell_end = jnp.clip((x2 / cell_dim).astype(jnp.int32), 0, max_cells - 1)
    di = jnp.sign(x2 - x1).astype(jnp.int32)
    inv_abs = 1.0 / jnp.maximum(jnp.abs(x2 - x1), 1e-30)
    minx = cell_dim * cellf
    maxx = minx + cell_dim
    dt = jnp.where(x1 > x2, x1 - minx, maxx - x1) * inv_abs
    deltat = cell_dim * inv_abs

    def fetch(c):
        return grid[c[:, 2], c[:, 1], c[:, 0]]

    def body(_, carry):
        cell, dt, acc, dt1_prev, alive = carry
        val = fetch(cell)
        # --- stepToNextCellNextHit (uniformgrid.cl:147-197) ---
        ax = (dt[:, 0] <= dt[:, 1]) & (dt[:, 0] <= dt[:, 2])
        ay = ~ax & (dt[:, 1] <= dt[:, 2])
        az = ~ax & ~ay
        advance = jnp.stack([ax, ay, az], axis=-1)
        t_hit = jnp.where(ax, dt[:, 0], jnp.where(ay, dt[:, 1], dt[:, 2]))
        at_end = jnp.any(advance & (cell == cell_end), axis=-1)
        cont = alive & ~at_end
        dt0 = dt1_prev
        dt1 = t_hit
        acc = acc + jnp.where(alive, val * (jnp.minimum(1.0, dt1) - dt0), 0.0)
        dt = jnp.where((advance & cont[:, None]), dt + deltat, dt)
        cell = jnp.where((advance & cont[:, None]), cell + di, cell)
        return cell, dt, acc, jnp.where(cont, dt1, dt1_prev), cont

    acc0 = jnp.zeros(m, jnp.float32)
    dt10 = jnp.zeros(m, jnp.float32)
    alive0 = jnp.ones(m, bool)
    _, _, acc, _, _ = jax.lax.fori_loop(
        0, max_steps, body, (cell, dt, acc0, dt10, alive0))
    length = jnp.linalg.norm(x2 - x1, axis=-1)
    return acc * length


@partial(jax.jit, static_argnames=("max_steps", "mode", "n_samples"))
def photon_path_importance(importance_grid: UniformGrid3D,
                           photons: PhotonData, light_samples: LightSamples,
                           max_steps: int = 96, mode: str = "dda",
                           n_samples: int = 8) -> Array:
    """Per-light-sample recomputation importance
    (photonRecomputationDetectorKernel, cl:92-157).

    Walks each stored interaction segment entry->exit through the importance
    grid. Returns (N,) float importance (higher = recompute first).
    """
    i_max, n, _ = photons.positions.shape
    grid = importance_grid.data
    cell_dim = importance_grid.cell_dim
    vol_dim = importance_grid.volume_dim  # (3,) voxels (x, y, z)
    big = 1e30

    t0 = light_samples.tspan[:, 0]
    t1 = light_samples.tspan[:, 1]
    valid_ray = t0 < t1
    entry0 = light_samples.origins + t0[:, None] * light_samples.directions

    exit_dir = decode_direction(photons.exit_direction)
    absorbed = photons.exit_power > big

    entries = []
    exits = []
    seg_valid = []
    entry = entry0
    alive = valid_ray
    for i in range(i_max):
        pos_i = photons.positions[i]  # (N, 3)
        is_sentinel = pos_i[:, 0] > big
        if i == 0:
            # Never interacted: segment spans the whole ray (entry->box exit).
            exit_plain = (light_samples.origins
                          + t1[:, None] * light_samples.directions)
        else:
            # Exited after >=1 scatters: extend along the stored exit
            # direction to the box boundary; absorbed paths stop.
            hit, _, bt1 = intersect.ray_box(entry, exit_dir)
            exit_plain = entry + bt1[:, None] * exit_dir
        sentinel_ok = (is_sentinel
                       & ((i == 0) | (~absorbed))
                       & ((i == 0) | hit if i > 0 else jnp.ones(n, bool)))
        seg_exit = jnp.where(is_sentinel[:, None], exit_plain, pos_i)
        use = alive & (~is_sentinel | sentinel_ok)
        entries.append(entry)
        exits.append(seg_exit)
        seg_valid.append(use)
        alive = alive & ~is_sentinel  # path continues only via real photons
        entry = pos_i

    e1 = jnp.concatenate(entries, axis=0)
    e2 = jnp.concatenate(exits, axis=0)
    sv = jnp.concatenate(seg_valid, axis=0)
    # texture -> voxel coords + 0.5 (photonrecomputationdetector.cl:152-153)
    x1 = e1 * vol_dim
    x2 = e2 * vol_dim
    x1 = jnp.where(sv[:, None], x1, 0.0)
    x2 = jnp.where(sv[:, None], x2, 0.0)
    if mode == "quadrature_mxu":
        # The one-hot matmul materializes a (K*M, gz*gy) operand: a huge
        # win at interactive scale (65k photons, 16^3 grid: ~1 GB of MXU
        # traffic beats 2M serial gathers 4.5x) but quadratic-in-scale —
        # at 4M photons over a 64^3 grid it would plan 34 GB (round-5
        # OOM). Static-shape dispatch: past ~4e9 one-hot elements the
        # serial-gather quadrature is both smaller and faster.
        onehot_elems = (n_samples * x1.shape[0]) * (grid.shape[0]
                                                    * grid.shape[1])
        if onehot_elems > (1 << 32):
            mode = "quadrature"
    if mode == "quadrature":
        seg_imp = grid_segment_integral_quadrature(grid, x1, x2, cell_dim,
                                                   n_samples)
    elif mode == "quadrature_mxu":
        seg_imp = grid_segment_integral_quadrature_mxu(grid, x1, x2,
                                                       cell_dim, n_samples)
    else:
        seg_imp = grid_segment_integral(grid, x1, x2, cell_dim, max_steps)
    seg_imp = jnp.where(sv, seg_imp, 0.0)
    return jnp.sum(seg_imp.reshape(i_max, n), axis=0)


@partial(jax.jit, static_argnames=("n", "percentage"))
def equal_importance(n: int, iteration: Array, percentage: int) -> Array:
    """Round-robin pseudo-importance: 1 for every (100/percentage)-th photon
    shifted by iteration (photonrecomputationdetector.cl:160-194)."""
    period = jnp.maximum(100 // percentage, 1)
    ids = jnp.arange(n, dtype=jnp.int32)
    return jnp.where((ids + iteration) % period == 0, 1.0, 0.0)


@partial(jax.jit, static_argnames=("n_samples",))
def grid_segment_integral_quadrature(grid: Array, x1: Array, x2: Array,
                                     cell_dim: Array,
                                     n_samples: int = 8) -> Array:
    """Midpoint-quadrature approximation of :func:`grid_segment_integral`.

    The exact Amanatides-Woo DDA spends one gather per (iteration,
    segment) — 64 x segments = 16.8M gathers = ~210 ms per correlated
    frame at 65k photons (measured round 4; gathers cost ~0.11 G/s
    regardless of table size). The importance only feeds a RANKING, so a
    fixed-K midpoint rule over the piecewise-constant grid is an adequate
    estimator at 1/8th the gathers; cells thinner than |seg|/K can be
    missed — use the DDA mode when exact drain coverage matters more than
    latency (config.recompute.importance_mode).
    """
    gz, gy, gx = grid.shape
    max_cells = jnp.array([gx, gy, gz], jnp.float32)
    ts = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    # (K, M, 3) sample points in voxel coords -> cell indices
    p = x1[None, :, :] + ts[:, None, None] * (x2 - x1)[None, :, :]
    c = jnp.clip(jnp.floor(p / cell_dim), 0.0, max_cells - 1.0
                 ).astype(jnp.int32)
    flat = grid.reshape(-1)
    idx = (c[..., 2] * gy + c[..., 1]) * gx + c[..., 0]
    vals = flat[idx]  # (K, M)
    length = jnp.linalg.norm(x2 - x1, axis=-1)
    return jnp.mean(vals, axis=0) * length


@partial(jax.jit, static_argnames=("n_samples",))
def grid_segment_integral_quadrature_mxu(grid: Array, x1: Array, x2: Array,
                                         cell_dim: Array,
                                         n_samples: int = 8) -> Array:
    """MXU one-hot formulation of
    :func:`grid_segment_integral_quadrature` — same math, no gathers.

    On the v5e the gather path costs ~8.5 ns/lookup regardless of table
    size (round-4/5 measurements), 18 ms per correlated frame at 65k
    photons x 8 samples; the importance grid is tiny (cells^3 values), so
    each sample's lookup grid[cz, cy, cx] is recast as a one-hot (z, y)
    row-selection matmul (exact: exactly ONE nonzero product per output,
    so no summation rounding; bf16_x3 keeps the operand f32-exact)
    followed by an elementwise one-hot x-selection. Measured ~4 ms for the
    identical ranking.
    """
    gz, gy, gx = grid.shape
    max_cells = jnp.array([gx, gy, gz], jnp.float32)
    ts = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    p = x1[None, :, :] + ts[:, None, None] * (x2 - x1)[None, :, :]
    c = jnp.clip(jnp.floor(p / cell_dim), 0.0, max_cells - 1.0
                 ).astype(jnp.int32)
    m = x1.shape[0]
    idx_zy = (c[..., 2] * gy + c[..., 1]).reshape(-1)  # (K*M,)
    oh = (idx_zy[:, None]
          == jnp.arange(gz * gy, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)
    rows = jax.lax.dot_general(
        oh, grid.reshape(gz * gy, gx),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision="BF16_BF16_F32_X3")  # (K*M, gx)
    cx = c[..., 0].reshape(-1)
    ohx = (cx[:, None] == jnp.arange(gx, dtype=jnp.int32)[None, :])
    vals = jnp.sum(jnp.where(ohx, rows, 0.0), axis=1).reshape(n_samples, m)
    length = jnp.linalg.norm(x2 - x1, axis=-1)
    return jnp.mean(vals, axis=0) * length
