"""Volume sampling and deterministic sample-grid generation.

Reference parity:
- trilinear normalized volume fetch  <- Inviwo ``samplers.cl``
  ``getNormalizedVoxel`` (texture-space coordinates, edge clamp).
- stratified 2D sample grid          <- modules/importancesamplingcl/cl/
  uniformsamplegenerator2d.cl:34-50 ((i+0.5)/n jittered optionally).
- Hilbert-curve sample ordering      <- cl/samplegridindex.cl:51-85.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def flat_take(table: Array, idx: Array) -> Array:
    """Gather ``table[idx]`` from a flat (V,) table via the TPU lane-gather
    fast path.

    XLA TPU lowers ``take_along_axis`` along the minor dimension to a fast
    VMEM lane gather (~3.6 G lookups/s measured on v5e for a 1 MB table),
    whereas a plain ``jnp.take``/``x[idx]`` gather runs ~110 M lookups/s.
    Every hot sampler in the pipeline goes through this helper.
    """
    out = jnp.take_along_axis(table[None, :], idx.reshape(1, -1), axis=-1)
    return out.reshape(idx.shape)


def _corner_indices(shape_zyx, pos: Array):
    """Shared trilinear setup: clamped corner coords + fractional weights."""
    d, h, w = shape_zyx
    dims = jnp.array([w, h, d], jnp.float32)
    cf = pos * dims - 0.5
    c0f = jnp.floor(cf)
    frac = cf - c0f
    c0 = jnp.clip(c0f.astype(jnp.int32), 0,
                  jnp.array([w - 1, h - 1, d - 1], jnp.int32))
    c1 = jnp.minimum(c0 + 1, jnp.array([w - 1, h - 1, d - 1], jnp.int32))
    return c0, c1, frac


def sample_volume_trilinear(data: Array, pos: Array) -> Array:
    """Trilinear fetch from a (D, H, W) volume at texture coords in [0,1]^3.

    ``pos[..., :]`` is (x, y, z); voxel centers sit at (i+0.5)/dim like GPU
    textures with normalized coordinates and CLAMP_TO_EDGE (the reference's
    ``getNormalizedVoxel`` sampler). Implemented as 8 flat lane-gathers.
    """
    d, h, w = data.shape
    c0, c1, frac = _corner_indices((d, h, w), pos)
    flat = data.reshape(-1)
    acc = 0.0
    for dz, cz in ((0, c0[..., 2]), (1, c1[..., 2])):
        wz = frac[..., 2] if dz else 1.0 - frac[..., 2]
        for dy, cy in ((0, c0[..., 1]), (1, c1[..., 1])):
            wy = frac[..., 1] if dy else 1.0 - frac[..., 1]
            base = (cz * h + cy) * w
            for dx, cx in ((0, c0[..., 0]), (1, c1[..., 0])):
                wx = frac[..., 0] if dx else 1.0 - frac[..., 0]
                v = flat_take(flat, base + cx)
                acc = acc + v * (wx * wy * wz)
    return acc


def sample_volume_trilinear_vec(data: Array, pos: Array) -> Array:
    """Trilinear fetch from a (D, H, W, C) volume; returns (..., C).

    Channels are gathered with a single lane-gather per corner by indexing
    the channel-major flattening."""
    d, h, w, c = data.shape
    c0, c1, frac = _corner_indices((d, h, w), pos)
    # channel-major (C, V) so each channel is one flat table
    flat = jnp.moveaxis(data.reshape(-1, c), -1, 0)
    acc = 0.0
    for dz, cz in ((0, c0[..., 2]), (1, c1[..., 2])):
        wz = frac[..., 2] if dz else 1.0 - frac[..., 2]
        for dy, cy in ((0, c0[..., 1]), (1, c1[..., 1])):
            wy = frac[..., 1] if dy else 1.0 - frac[..., 1]
            base = (cz * h + cy) * w
            for dx, cx in ((0, c0[..., 0]), (1, c1[..., 0])):
                wx = frac[..., 0] if dx else 1.0 - frac[..., 0]
                idx = (base + cx).reshape(1, -1)
                v = jnp.take_along_axis(
                    flat, jnp.broadcast_to(idx, (c,) + idx.shape[1:]),
                    axis=-1)
                v = jnp.moveaxis(v, 0, -1).reshape(pos.shape[:-1] + (c,))
                acc = acc + v * (wx * wy * wz)[..., None]
    return acc


def stratified_grid_2d(nx: int, ny: int, key=None) -> Array:
    """(nx*ny, 4) samples (u, v, 0, pdf=1) on a stratified 2D grid.

    Deterministic centers by default (the reference's
    uniformSampleGenerator2DKernel); pass a PRNG key for jittered strata.
    """
    ix = jnp.arange(nx, dtype=jnp.float32)
    iy = jnp.arange(ny, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(ix, iy, indexing="xy")
    if key is None:
        ju = jv = 0.5
    else:
        k1, k2 = jax.random.split(key)
        ju = jax.random.uniform(k1, gx.shape)
        jv = jax.random.uniform(k2, gy.shape)
    u = (gx + ju) / nx
    v = (gy + jv) / ny
    flat = jnp.stack([u.ravel(), v.ravel(),
                      jnp.zeros(nx * ny), jnp.ones(nx * ny)], axis=-1)
    return flat


def hilbert_index_2d(u: Array, v: Array, order: int = 8) -> Array:
    """Map 2D samples in [0,1]^2 to a Hilbert-curve index for spatially
    coherent ordering (reference: cl/samplegridindex.cl:51-60).

    Fixed-iteration bit-interleave version of the classic d2xy inverse.
    """
    n = 1 << order
    x = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
    y = jnp.clip((v * n).astype(jnp.int32), 0, n - 1)
    d = jnp.zeros_like(x)
    for i in range(order - 1, -1, -1):
        s = 1 << i
        rx = jnp.where((x & s) > 0, 1, 0)
        ry = jnp.where((y & s) > 0, 1, 0)
        d = d + s * s * ((3 * rx) ^ ry)
        # Rotate quadrant: when ry == 0, optionally mirror (rx == 1), then
        # swap x and y (branch-free form of the classic Hilbert rot()).
        flip = (ry == 0) & (rx == 1)
        x = jnp.where(flip, s - 1 - x, x)
        y = jnp.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = jnp.where(swap, y, x), jnp.where(swap, x, y)
    return d
