"""Scalable binned photon splat: sort -> tile -> MXU, the clogs-radix-sort
role at BASELINE config-5 scale.

Reference parity: the role of clogs radix sort + atomic splat at millions of
photons (modules/radixsortcl/ext/clogs/kernels/radixsort.cl:247-1100 feeding
photonstolightvolume.cl:139-166). The reference sorts photon indices on the
GPU so the atomic splat hits memory coherently; TPUs have neither atomics
nor fast random scatter (honest v5e rates: XLA scatter ~0.12 G adds/s, so
the exact per-cell scatter of 4M x 4 x 4^3-footprint deposits costs ~28 s).

TPU-first redesign — make the photon-bound work MXU work:

  1. key every deposit by the 8^3-cell TILE containing its footprint start
     cell (invalid/sentinel deposits key past the last tile),
  2. ``lax.sort_key_val`` the keys (measured 104 ms at 16.7M — cheap),
  3. slice the sorted stream into fixed-capacity per-(tile, round) blocks
     (two gathers; the sort pushed invalid deposits to the end so only the
     valid prefix is ever touched),
  4. per block, evaluate the separable product-Epanechnikov factors
     a = kz (x) ky (S, 12*12) and b = kx (x) power (S, 12*3) densely and
     contract with ONE batched MXU matmul into the tile's halo'd
     (12,12,12,3) region — identical math to
     :func:`cpm_tpu.ops.splat.splat_product_xla`, but O(deposits * tile)
     instead of O(deposits * whole grid),
  5. overlap-add the halo'd tiles into the global grid with eight dense
     shifted reshapes (no scatter).

Occupancy skew (photons cluster where light is) is handled by a host-side
work list: tile t contributes ceil(count_t / K_cap) blocks, so padding
waste is bounded by one block per non-empty tile regardless of skew; the
block count is read back from the (tiny) per-tile histogram, which is the
analog of the reference's blocking clogs::Reduce readback
(progressivephotontracercl.cpp:374).

Deterministic by construction (fixed block order, no atomics), like every
other splat backend here. Results are allclose — not bit-identical — to
``splat_product_xla`` (different summation order).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core import constants
from cpm_tpu.core.types import PhotonData, relative_irradiance_scale
from cpm_tpu.pallas.splat_mxu import PRODUCT_KERNEL_MATCH

Array = jnp.ndarray

TILE = 8  # cells per tile axis; halo'd region = TILE + footprint


def _tile_counts(nt: tuple) -> int:
    return nt[0] * nt[1] * nt[2]


@jax.jit
def _pack_deposits(positions: Array, powers: Array, scale: Array) -> Array:
    """(M, 8) [pos3 | scaled pow3 | 0 0] deposit rows, built IN-JIT: the
    eager concat + scalar-multiply cost ~0.5 s of tunnel overhead per
    call when done between dispatches (round-5 eager-op calibration).
    ``scale`` is the raw user scale; the product-kernel match factor is
    applied here so no scalar math happens eagerly."""
    m = positions.shape[0]
    s = jnp.asarray(scale, jnp.float32) * jnp.float32(PRODUCT_KERNEL_MATCH)
    return jnp.concatenate(
        [positions.astype(jnp.float32),
         powers.astype(jnp.float32) * s,
         jnp.zeros((m, 2), jnp.float32)], axis=1)


@partial(jax.jit, static_argnames=("dims", "nt"))
def _sort_by_tile(positions: Array, radius_rel: Array, dims: tuple,
                  nt: tuple):
    """Per-deposit tile keys, sorted with their deposit indices.

    The key is the tile of the footprint START cell
    (photonstolightvolume.cl:45 convention: start = max(0,
    trunc(p*dim - 0.5 - r*dim))); all footprint cells then lie in
    [tile*TILE, tile*TILE + TILE + footprint - 2], inside the halo'd
    region. Invalid deposits (sentinel position) key to n_tiles and sort
    to the end, so downstream blocks only touch the valid prefix.
    """
    d, h, w = dims
    dimv = jnp.array([w, h, d], jnp.float32)
    start = jnp.maximum(
        0, jnp.trunc((positions - radius_rel) * dimv - 0.5).astype(jnp.int32))
    tx = jnp.minimum(start[:, 0] // TILE, nt[2] - 1)
    ty = jnp.minimum(start[:, 1] // TILE, nt[1] - 1)
    tz = jnp.minimum(start[:, 2] // TILE, nt[0] - 1)
    key = (tz * nt[1] + ty) * nt[2] + tx
    valid = positions[:, 0] < 1e30
    key = jnp.where(valid, key, _tile_counts(nt))
    idx = jnp.arange(positions.shape[0], dtype=jnp.int32)
    return jax.lax.sort_key_val(key, idx)


@partial(jax.jit, static_argnames=("n_tiles",))
def _segment_starts(sorted_keys: Array, n_tiles: int) -> Array:
    """(n_tiles + 1,) start offset of each tile's run in the sorted order;
    [n_tiles] is the count of valid deposits."""
    return jnp.searchsorted(
        sorted_keys, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)


@partial(jax.jit,
         static_argnames=("dims", "nt", "he", "k_cap", "footprint"))
def _splat_blocks(acc: Array, data8: Array, order: Array, seg_start: Array,
                  tiles: Array, bases: Array, radius_rel: Array,
                  dims: tuple, nt: tuple, he: int, k_cap: int,
                  footprint: int) -> Array:
    """Accumulate one work-list chunk of (tile, base-offset) blocks into the
    (n_tiles, he^3 * 3) accumulator.

    ``data8``: (M, 8) packed [x, y, z, pw_r, pw_g, pw_b, 0, 0] deposit rows
    (one row gather instead of two). ``tiles``/``bases``: (A,) static-width
    chunk of the host work list; padding items carry base >= count and
    produce all-invalid slots.
    """
    del footprint  # support is inside the halo by construction (see doc)
    d, h, w = dims
    a_chunk = tiles.shape[0]
    t_lo = seg_start[tiles]  # (A,)
    t_hi = seg_start[tiles + 1]
    slot = (t_lo + bases)[:, None] + jnp.arange(k_cap, dtype=jnp.int32)
    slot_valid = slot < t_hi[:, None]  # (A, K)
    flat = jnp.clip(slot.reshape(-1), 0, order.shape[0] - 1)
    rows = data8[order[flat]]  # (A*K, 8)
    pos = rows[:, 0:3]
    pw = rows[:, 3:6] * slot_valid.reshape(-1)[:, None].astype(jnp.float32)

    # Tile origin cell per slot (xyz).
    tzi = tiles // (nt[1] * nt[2])
    tyi = (tiles // nt[2]) % nt[1]
    txi = tiles % nt[2]
    org = jnp.stack([txi, tyi, tzi], axis=-1).astype(jnp.float32) * TILE
    org = jnp.repeat(org, k_cap, axis=0)  # (A*K, 3) cell origin (x, y, z)

    inv_r = 1.0 / radius_rel
    offs = jnp.arange(he, dtype=jnp.float32)

    def axis_k(axis, n_axis):
        centers = (org[:, axis, None] + offs[None, :] + 0.5) / n_axis
        t = (centers - pos[:, axis, None]) * inv_r
        k = jnp.maximum(0.75 * (1.0 - t * t), 0.0)
        # Crop cells past the grid edge (the global grid is later cropped
        # too, but zeroing here keeps energy accounting exact per block).
        return jnp.where(org[:, axis, None] + offs[None, :] < n_axis, k, 0.0)

    kx = axis_k(0, w)  # (S, he)
    ky = axis_k(1, h)
    kz = axis_k(2, d)

    a_f = (kz[:, :, None] * ky[:, None, :]).reshape(-1, he * he)
    b_f = (kx[:, :, None] * pw[:, None, :]).reshape(-1, he * 3)
    a_b = a_f.reshape(a_chunk, k_cap, he * he)
    b_b = b_f.reshape(a_chunk, k_cap, he * 3)
    out = jax.lax.dot_general(
        a_b, b_b, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (A, he*he, he*3)
    return acc.at[tiles].add(out.reshape(a_chunk, -1))


def _fold_front(x: Array) -> Array:
    """Overlap-add the leading (nt, he) axis pair of ``x`` into one
    (nt * TILE + he - TILE) axis: halo offsets [0, TILE) land in their own
    block, offsets [TILE, he) spill into the NEXT block's cells — realized
    as two dense pad/reshape/adds, no scatter."""
    nt, he = x.shape[0], x.shape[1]
    rest_shape = x.shape[2:]
    spill = he - TILE
    zeros = [(0, 0)] * len(rest_shape)
    main = x[:, :TILE].reshape(nt * TILE, *rest_shape)
    main = jnp.pad(main, [(0, spill)] + zeros)
    # offsets [TILE, he) of block t live at cell t*TILE + TILE + o':
    # pad the halo slice back to TILE width, flatten, shift by +TILE.
    halo = jnp.pad(x[:, TILE:], [(0, 0), (0, TILE - spill)] + zeros)
    halo = halo.reshape(nt * TILE, *rest_shape)
    halo = jnp.pad(halo, [(TILE, 0)] + zeros)[:nt * TILE + spill]
    return main + halo


def _fold_axis(x: Array, i: int) -> Array:
    """Apply :func:`_fold_front` to the (nt, he) pair at axes (i, i+1)."""
    x = jnp.moveaxis(x, (i, i + 1), (0, 1))
    return jnp.moveaxis(_fold_front(x), 0, i)


@partial(jax.jit, static_argnames=("dims", "nt", "he"))
def _combine(acc: Array, dims: tuple, nt: tuple, he: int) -> Array:
    """(n_tiles, he^3*3) halo'd tiles -> (D, H, W, 3) global grid."""
    d, h, w = dims
    x = acc.reshape(nt[0], nt[1], nt[2], he, he, he, 3)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5, 6))  # (ntz, he, nty, he, ...)
    x = _fold_axis(x, 0)  # (Dz', nty, he, ntx, he, 3)
    x = _fold_axis(x, 1)  # (Dz', Dy', ntx, he, 3)
    x = _fold_axis(x, 2)  # (Dz', Dy', Dx', 3)
    return x[:d, :h, :w]


def splat_binned_flat(positions: Array, powers: Array, radius_rel,
                      scale, out_dim: tuple, footprint: int = 4,
                      k_cap: int = 4096, a_chunk: int = 64) -> Array:
    """Splat a flat deposit list with the sort/tile/MXU pipeline.

    Host-orchestrated (the per-tile histogram readback sizes the work
    list), so call it OUTSIDE jit — the config-5-scale analog of
    :func:`cpm_tpu.ops.splat.splat_all_chunked`. Math identical to
    ``splat_product_xla`` with the same ``scale`` convention: ``powers``
    are scaled by ``scale * PRODUCT_KERNEL_MATCH`` internally, invalid
    deposits are masked by their position sentinel.
    """
    d, h, w = out_dim
    he = TILE + footprint
    if footprint > TILE:
        raise ValueError(f"footprint {footprint} > tile {TILE}")
    nt = (-(-d // TILE), -(-h // TILE), -(-w // TILE))
    n_tiles = _tile_counts(nt)

    sorted_keys, order = _sort_by_tile(positions, radius_rel, out_dim, nt)
    seg_start = _segment_starts(sorted_keys, n_tiles)
    data8 = _pack_deposits(positions, powers, scale)
    counts = np.asarray(seg_start)
    counts = counts[1:] - counts[:-1]  # host histogram (tiny readback)

    # Work list: (tile, base) per K_cap-block of each non-empty tile.
    tiles_l, bases_l = [], []
    for t in np.nonzero(counts)[0]:
        for base in range(0, int(counts[t]), k_cap):
            tiles_l.append(t)
            bases_l.append(base)

    acc = jnp.zeros((n_tiles, he * he * he * 3), jnp.float32)
    n_items = len(tiles_l)
    for lo in range(0, n_items, a_chunk):
        chunk_t = tiles_l[lo:lo + a_chunk]
        chunk_b = bases_l[lo:lo + a_chunk]
        pad = a_chunk - len(chunk_t)
        if pad:
            # Padding items point past their tile's run -> all-invalid.
            chunk_t = chunk_t + [0] * pad
            chunk_b = chunk_b + [1 << 30] * pad
        acc = _splat_blocks(
            acc, data8, order, seg_start,
            jnp.asarray(chunk_t, jnp.int32), jnp.asarray(chunk_b, jnp.int32),
            radius_rel, out_dim, nt, he, k_cap, footprint)
    return _combine(acc, out_dim, nt, he)


@partial(jax.jit, static_argnames=("n_total",))
def _flatten_photons(photons: PhotonData, n_total: int):
    """In-jit flatten + irradiance-scale computation (eager scalar ops
    cost ~86 ms each on the axon tunnel — round-5 calibration)."""
    i, n, _ = photons.positions.shape
    pos = photons.positions.reshape(i * n, 3).astype(jnp.float32)
    pow_ = photons.powers.reshape(i * n, 3).astype(jnp.float32)
    scale = (jnp.float32(constants.ISOTROPIC_PHASE)
             * relative_irradiance_scale(n_total, photons.radius_rel))
    return pos, pow_, scale


def splat_all_binned(photons: PhotonData, out_dim: tuple,
                     footprint: int = 4, n_total: int | None = None,
                     k_cap: int = 4096) -> Array:
    """Full-photon-map binned splat (the scalable twin of
    :func:`cpm_tpu.ops.splat.splat_all`); see module docstring."""
    n = photons.positions.shape[1]
    pos, pow_, scale = _flatten_photons(
        photons, n_total if n_total is not None else n)
    return splat_binned_flat(pos, pow_, photons.radius_rel, scale, out_dim,
                             footprint, k_cap=k_cap)
