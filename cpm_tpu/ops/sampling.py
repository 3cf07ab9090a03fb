"""Volume sampling and deterministic sample-grid generation.

Reference parity:
- trilinear normalized volume fetch  <- Inviwo ``samplers.cl``
  ``getNormalizedVoxel`` (texture-space coordinates, edge clamp).
- stratified 2D sample grid          <- modules/importancesamplingcl/cl/
  uniformsamplegenerator2d.cl:34-50 ((i+0.5)/n jittered optionally).
- Hilbert-curve sample ordering      <- cl/samplegridindex.cl:51-85.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def flat_take(table: Array, idx: Array) -> Array:
    """Gather ``table[idx]`` from a flat (V,) table.

    Honest v5e numbers (round 4, per-rep host-readback sync, in-jit chained):
    plain ``table[idx]`` = 0.117 G lookups/s; ``take_along_axis`` on the
    minor dim = 0.036 G lookups/s (round 3's "11-46 G" figure was a
    benchmark-sync artifact). Plain indexing is the fastest XLA gather form;
    the cost is per INDEX, nearly independent of row width — which is why
    the hot paths prefer one packed row-gather (:func:`pack_corners` +
    :func:`sample_volume_trilinear_packed`) over 8 scalar gathers.
    """
    return table[idx]


def _corner_indices(shape_zyx, pos: Array):
    """Shared trilinear setup: clamped corner coords + fractional weights.

    The continuous voxel coordinate is clamped to [0, dim-1] BEFORE the
    floor/frac split — true CLAMP_TO_EDGE: within half a voxel of a face
    the edge texel dominates and exactly at/beyond it the edge texel is
    returned, matching the reference's ``getNormalizedVoxel`` sampler
    (Inviwo samplers.cl; clamping after the split leaks the neighbor texel
    in with weight up to 1)."""
    d, h, w = shape_zyx
    dims = jnp.array([w, h, d], jnp.float32)
    cf = jnp.clip(pos * dims - 0.5, 0.0, dims - 1.0)
    c0f = jnp.floor(cf)
    frac = cf - c0f
    c0 = c0f.astype(jnp.int32)
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


def pack_corners(data: Array) -> Array:
    """Repack a (D, H, W) volume into (D*H*W, 8) rows where row (z*H+y)*W+x
    holds the 2x2x2 cell corners data[z+dz, y+dy, x+dx] (edge-clamped),
    k = dz*4 + dy*2 + dx.

    TPU gather cost is per INDEX (measured: 65-97 M rows/s for widths
    1..128), so fetching all 8 trilinear corners as ONE row-gather is ~5x
    cheaper than 8 flat gathers. 8x memory (e.g. 67 MB for 128^3) buys the
    tracer hot loop its volume fetch at row-gather speed.
    """
    d, h, w = data.shape
    parts = []
    for dz in (0, 1):
        zsl = jnp.concatenate([data[dz:], data[-1:]] if dz else [data], 0)[:d]
        for dy in (0, 1):
            ysl = jnp.concatenate([zsl[:, dy:], zsl[:, -1:]] if dy
                                  else [zsl], 1)[:, :h]
            for dx in (0, 1):
                xsl = jnp.concatenate([ysl[:, :, dx:], ysl[:, :, -1:]] if dx
                                      else [ysl], 2)[:, :, :w]
                parts.append(xsl.reshape(-1))
    return jnp.stack(parts, axis=-1)


def corner_row_index(shape_zyx, pos: Array):
    """(row index into a pack_corners table, fractional weights) for ``pos``."""
    d, h, w = shape_zyx
    c0, _, frac = _corner_indices((d, h, w), pos)
    return (c0[..., 2] * h + c0[..., 1]) * w + c0[..., 0], frac


def trilinear_weights(frac: Array) -> Array:
    """(..., 8) corner weights in k = dz*4 + dy*2 + dx order."""
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    wx = jnp.stack([1.0 - fx, fx], -1)  # (..., 2)
    wy = jnp.stack([1.0 - fy, fy], -1)
    wz = jnp.stack([1.0 - fz, fz], -1)
    return (wz[..., :, None, None] * wy[..., None, :, None]
            * wx[..., None, None, :]).reshape(frac.shape[:-1] + (8,))


def sample_volume_trilinear_packed(packed: Array, shape_zyx, pos: Array) -> Array:
    """Trilinear fetch via ONE (N, 8) row-gather from :func:`pack_corners`
    output; same semantics as :func:`sample_volume_trilinear`. Extra columns
    beyond the first 8 (e.g. a fused per-voxel majorant) are ignored.

    Corner-k weight = prod over axes of (f or 1-f); the high-edge clamp is
    consistent because pack_corners edge-clamps its +1 neighbors."""
    idx, frac = corner_row_index(shape_zyx, pos)
    rows = packed[idx]  # (..., >=8)
    return jnp.sum(rows[..., :8] * trilinear_weights(frac), axis=-1)


def brick_slots(scale: int) -> int:
    """Corner slots per brick row at ``scale`` voxels per brick axis."""
    return 8 * scale ** 3


def brick_width(scale: int) -> int:
    """Row width: corner slots + extra columns (majorant, skip distance),
    padded to a multiple of 8."""
    return ((brick_slots(scale) + 2 + 7) // 8) * 8


def pack_bricks(data: Array, extra: Array | None = None,
                scale: int = 2) -> Array:
    """Repack a (D, H, W) volume into 1/scale-resolution brick rows covering
    every trilinear stencil inside a scale^3-voxel brick with ONE row fetch.

    Row (hz*H2 + hy)*W2 + hx holds the (2*scale)^3 voxel window starting at
    the brick base (edge-clamped): slot (oz, oy, ox) row-major =
    data[scale*hz + oz, scale*hy + oy, scale*hx + ox]. The window covers
    every trilinear stencil whose base voxel lies inside the brick.
    :func:`brick_weights` produces matching 2*scale-tap tent weights per
    axis. Column ``brick_slots(scale)`` carries ``extra`` (e.g. the local
    macrocell majorant) at the brick's base voxel; rows are padded to
    :func:`brick_width`.

    Why this shape (all numbers honest v5e, round 4):
    - gather throughput scales with table ROW COUNT, not bytes: 2^18 rows
      at w=8 -> 143 M rows/s, 2^21 rows -> 74 M rows/s, small tables
      (<=2^16 rows) -> ~165 M rows/s; scale=4 puts a 128^3 volume at 2^15
      rows.
    - the build extracts the sliding windows with ONE
      ``conv_general_dilated_patches`` (an MXU im2col): the previous 6-D
      reshape/transpose build materialized tensors whose minor dims equal
      ``scale``, which TPU (8, 128) tiling pads up to 64x — a 34 GB
      allocation at 512^3 (round-5 OOM). Patch extraction keeps every
      intermediate in (spatial..., channels) layout with a 128-friendly
      minor dim.
    """
    d, h, w = data.shape
    k = scale
    d2, h2, w2 = -(-d // k), -(-h // k), -(-w // k)
    v = jnp.pad(data, ((0, k * d2 - d + k), (0, k * h2 - h + k),
                       (0, k * w2 - w + k)), mode="edge")
    patches = jax.lax.conv_general_dilated_patches(
        v[None, None], filter_shape=(2 * k, 2 * k, 2 * k),
        window_strides=(k, k, k), padding="VALID")  # (1, 8k^3, d2, h2, w2)
    rows = jnp.moveaxis(patches[0], 0, -1)  # (d2, h2, w2, 8k^3) row-major

    if extra is None:
        extra = jnp.zeros(data.shape + (1,), data.dtype)
    elif extra.ndim == 3:
        extra = extra[..., None]
    n_extra = extra.shape[-1]
    assert brick_slots(k) + n_extra <= brick_width(k), (n_extra, k)
    xtr = extra[::k, ::k, ::k][:d2, :h2, :w2, :]
    pad = jnp.zeros((d2, h2, w2, brick_width(k) - brick_slots(k) - n_extra),
                    data.dtype)
    return jnp.concatenate([rows, xtr, pad], axis=-1).reshape(
        d2 * h2 * w2, brick_width(k))


def brick_row_index(shape_zyx, pos: Array, scale: int = 2):
    """(brick row index, (..., 3) local coords in [0, scale]) for ``pos``.

    Coordinates are clamped to [0, dim-1] voxel space first (CLAMP_TO_EDGE);
    inside the volume this matches :func:`sample_volume_trilinear` exactly.
    """
    d, h, w = shape_zyx
    dims = jnp.array([w, h, d], jnp.float32)
    cf = jnp.clip(pos * dims - 0.5, 0.0, dims - 1.0)
    br = jnp.floor(cf).astype(jnp.int32) // scale
    local = cf - float(scale) * br.astype(jnp.float32)
    h2, w2 = -(-h // scale), -(-w // scale)
    idx = (br[..., 2] * h2 + br[..., 1]) * w2 + br[..., 0]
    return idx, local


def brick_weights(local: Array, scale: int = 2) -> Array:
    """(..., 8*scale^3) trilinear weights matching :func:`pack_bricks` slot
    order (oz, oy, ox row-major over the (2*scale)^3 window); per axis a
    2*scale-tap tent over tap offset o (at most two taps are nonzero)."""
    k = scale
    taps = jnp.arange(2 * k, dtype=jnp.float32)
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(local[..., 2:3] - taps))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(local[..., 1:2] - taps))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(local[..., 0:1] - taps))
    out = (wz[..., :, None, None]
           * wy[..., None, :, None]
           * wx[..., None, None, :])
    return out.reshape(local.shape[:-1] + (8 * k ** 3,))


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


@partial(jax.jit, static_argnames=())
def warp_samples_2d(samples: Array, guide: Array,
                    floor: float = 0.1) -> Array:
    """Warp stratified (u, v) samples by the inverse CDF of a 2D guide map.

    The importance-guided-emission warp (BASELINE config 3 / north star):
    ``guide`` is a (Bv, Bu) nonnegative density proxy over the light plane;
    samples are redistributed so the emission density is the piecewise-
    constant mixture f = (1 - floor) * guide/mean(guide) + floor, and each
    sample's pdf column (samples[:, 3]) is MULTIPLIED by f(u', v') — the
    ``power = radiance / pdf`` chain downstream
    (lightcl/cl/directionallightsampler.cl:37-62) then keeps the estimator
    unbiased for ANY guide. ``floor`` in (0, 1] mixes in the uniform
    density so the support never vanishes (zero-importance regions still
    get (floor)x the uniform photon density).

    Row-major factorization: v by the row-marginal inverse CDF, u by the
    conditional inverse CDF of v's row. Both are exact piecewise-linear
    CDF inversions over the bin grid, so a stratified input grid stays
    stratified under the warp (low-discrepancy preserving).
    """
    bv, bu = guide.shape
    g = jnp.maximum(guide, 0.0)
    mean = jnp.maximum(jnp.mean(g), 1e-20)
    f = (1.0 - floor) * g / mean + floor  # (Bv, Bu), mean ~ 1

    u, v = samples[:, 0], samples[:, 1]
    # --- v: row-marginal inverse CDF ---
    mv = jnp.mean(f, axis=1)  # (Bv,) row masses (mean over u)
    mv = mv / jnp.sum(mv)
    cdf_v = jnp.concatenate([jnp.zeros(1), jnp.cumsum(mv)])
    cdf_v = cdf_v.at[-1].set(1.0)
    r = jnp.clip(jnp.searchsorted(cdf_v, v, side="right") - 1, 0, bv - 1)
    binmass_v = jnp.maximum(cdf_v[r + 1] - cdf_v[r], 1e-20)
    v2 = (r + (v - cdf_v[r]) / binmass_v) / bv
    pdf_v = binmass_v * bv

    # --- u: conditional inverse CDF of row r ---
    rowsum = jnp.maximum(jnp.sum(f, axis=1, keepdims=True), 1e-20)
    cdf_u = jnp.concatenate(
        [jnp.zeros((bv, 1)), jnp.cumsum(f / rowsum, axis=1)], axis=1)
    cdf_u = cdf_u.at[:, -1].set(1.0)
    rows = cdf_u[r]  # (N, Bu+1)
    c = jnp.clip(
        jnp.sum((rows <= u[:, None]).astype(jnp.int32), axis=1) - 1,
        0, bu - 1)
    lo = jnp.take_along_axis(rows, c[:, None], axis=1)[:, 0]
    hi = jnp.take_along_axis(rows, c[:, None] + 1, axis=1)[:, 0]
    binmass_u = jnp.maximum(hi - lo, 1e-20)
    u2 = (c + (u - lo) / binmass_u) / bu
    pdf_u = binmass_u * bu

    pdf = samples[:, 3] * (pdf_v * pdf_u)
    return jnp.stack([u2, v2, samples[:, 2], pdf], axis=-1)
