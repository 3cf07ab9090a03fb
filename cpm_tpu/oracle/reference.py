"""CPU/numpy oracle implementations — slow, loop-based, written for clarity.

These mirror the reference's device kernels as directly as possible and are
the allclose targets for the vectorized TPU ops (SURVEY.md §4: the test
suite is built around CPU reference implementations).
"""

from __future__ import annotations

import numpy as np


def trilinear_oracle(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Normalized-coordinate trilinear fetch with edge clamp, (D,H,W)."""
    d, h, w = data.shape
    dims = np.array([w, h, d], np.float64)
    out = np.empty(len(pos), np.float64)
    for i, p in enumerate(pos):
        cf = p * dims - 0.5
        c0 = np.floor(cf).astype(int)
        f = cf - c0
        acc = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    c = np.clip(c0 + [dx, dy, dz], 0,
                                [w - 1, h - 1, d - 1])
                    wgt = ((f[0] if dx else 1 - f[0])
                           * (f[1] if dy else 1 - f[1])
                           * (f[2] if dz else 1 - f[2]))
                    acc += data[c[2], c[1], c[0]] * wgt
        out[i] = acc
    return out


def epanechnikov_oracle(x: float) -> float:
    return 0.75 * (1.0 - x * x) if x <= 1.0 else 0.0


def splat_oracle(positions: np.ndarray, powers: np.ndarray, valid: np.ndarray,
                 radius: float, scale: float, out_dim: tuple) -> np.ndarray:
    """Direct port of splatPhoton's voxel-AABB loop
    (photonstolightvolume.cl:31-79) in numpy."""
    d, h, w = out_dim
    dims = np.array([w, h, d], np.float64)
    grid = np.zeros((d, h, w, 3), np.float64)
    for p, pw, ok in zip(positions, powers, valid):
        if not ok:
            continue
        start = np.maximum(0, np.trunc((p - radius) * dims - 0.5)).astype(int)
        end = np.minimum(np.trunc((p + radius) * dims - 0.5).astype(int) + 1,
                         [w, h, d])
        for z in range(start[2], end[2]):
            for y in range(start[1], end[1]):
                for x in range(start[0], end[0]):
                    tex = (np.array([x, y, z]) + 0.5) / dims
                    dist = np.linalg.norm(tex - p)
                    wgt = epanechnikov_oracle(dist / radius)
                    grid[z, y, x] += pw * (wgt * scale)
    return grid


def dda_integral_oracle(grid: np.ndarray, x1: np.ndarray, x2: np.ndarray,
                        cell_dim: np.ndarray) -> float:
    """Direct port of uniformGridImportance + stepToNextCellNextHit
    (photonrecomputationdetector.cl:55-90, uniformgrid.cl:38-197)."""
    gz, gy, gx = grid.shape
    max_cells = np.array([gx, gy, gz])
    cellf = np.clip(np.floor(x1 / cell_dim), 0, max_cells - 1)
    cell = cellf.astype(int)
    cell_end = np.clip((x2 / cell_dim).astype(int), 0, max_cells - 1)
    di = np.sign(x2 - x1).astype(int)
    with np.errstate(divide="ignore"):
        inv_abs = 1.0 / np.abs(x2 - x1)
    minx = cell_dim * cellf
    maxx = minx + cell_dim
    dt = np.where(x1 > x2, x1 - minx, maxx - x1) * inv_abs
    deltat = cell_dim * inv_abs

    importance = 0.0
    dt1 = 0.0
    cont = True
    guard = 0
    while cont and guard < 10000:
        guard += 1
        val = grid[cell[2], cell[1], cell[0]]
        dt0 = dt1
        # stepToNextCellNextHit
        if dt[0] <= dt[1] and dt[0] <= dt[2]:
            axis = 0
        elif dt[1] <= dt[2]:
            axis = 1
        else:
            axis = 2
        dt1 = dt[axis]
        if cell[axis] == cell_end[axis]:
            cont = False
        else:
            dt[axis] += deltat[axis]
            cell[axis] += di[axis]
        importance += val * (min(1.0, dt1) - dt0)
    return importance * np.linalg.norm(x2 - x1)


def transmittance_oracle(data: np.ndarray, tf_lut: np.ndarray,
                         origin: np.ndarray, direction: np.ndarray,
                         t0: float, t1: float, n_steps: int,
                         sigma_scale: float = 150.0) -> float:
    """Riemann transmittance along a ray (transmittance.cl:42-62 analog)."""
    dt = (t1 - t0) / n_steps
    thick = 0.0
    k = len(tf_lut)
    for i in range(n_steps):
        t = t0 + (i + 0.5) * dt
        p = origin + t * direction
        v = trilinear_oracle(data, p[None])[0]
        xf = np.clip(v * k - 0.5, 0, k - 1)
        i0 = int(np.floor(xf))
        i1 = min(i0 + 1, k - 1)
        f = xf - i0
        opacity = tf_lut[i0, 3] * (1 - f) + tf_lut[i1, 3] * f
        thick += opacity
    return float(np.exp(-thick * dt * sigma_scale))


def tf_eval_oracle(tf_positions: np.ndarray, tf_colors: np.ndarray,
                   x: np.ndarray) -> np.ndarray:
    """Piecewise-linear RGBA transfer function with edge clamp (the
    reference's tfData texture semantics at infinite resolution)."""
    out = np.empty(x.shape + (4,), np.float64)
    for c in range(4):
        out[..., c] = np.interp(x, tf_positions, tf_colors[:, c])
    return out


def dvr_zplane_oracle(data: np.ndarray, tf_positions: np.ndarray,
                      tf_colors: np.ndarray, light: np.ndarray,
                      o: np.ndarray, d: np.ndarray, za: np.ndarray,
                      axis: int, ambient: float,
                      sampling_base_interval_rcp: float = 150.0
                      ) -> np.ndarray:
    """End-to-end CPU render oracle: emission-absorption DVR over z-plane
    quadrature (the sweep renderer's discretization), float64 numpy
    throughout. Mirrors the LightingRaycaster compositing with extinction =
    TF opacity * SAMPLING_BASE_INTERVAL_RCP (transmittance.cl:40-62).

    ``light`` is (d, h, w, 3). Rays (N, 3); returns (N, 4) RGBA.
    """
    n = o.shape[0]
    S = len(za)
    dz = 1.0 / S
    rgb = np.zeros((n, 3), np.float64)
    trans = np.ones(n, np.float64)
    others = [i for i in range(3) if i != axis]
    d_a = d[:, axis]
    sec = np.linalg.norm(d, axis=-1) / np.maximum(np.abs(d_a), 1e-12)
    for za_k in za:
        t = (za_k - o[:, axis]) / d_a
        p = o + t[:, None] * d
        inside = ((t > 0)
                  & (p[:, others[0]] >= 0) & (p[:, others[0]] <= 1)
                  & (p[:, others[1]] >= 0) & (p[:, others[1]] <= 1))
        f = trilinear_oracle(data, p)
        rgba = tf_eval_oracle(tf_positions, tf_colors, f)
        lrgb = np.stack([trilinear_oracle(light[..., c], p)
                         for c in range(3)], axis=-1)
        tau = rgba[:, 3] * sampling_base_interval_rcp * dz * sec * inside
        seg_t = np.exp(-tau)
        emit = rgba[:, :3] * (lrgb + ambient)
        rgb += (trans * (1.0 - seg_t))[:, None] * emit
        trans *= seg_t
    return np.concatenate([rgb, (1.0 - trans)[:, None]], axis=-1)
