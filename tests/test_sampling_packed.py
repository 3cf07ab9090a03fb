"""Packed-corner trilinear sampling equals the 8-gather formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.ops.sampling import (pack_corners, sample_volume_trilinear,
                                  sample_volume_trilinear_packed)


def test_packed_matches_unpacked():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.random((9, 7, 5)), jnp.float32)
    pos = jnp.asarray(rng.random((1000, 3)) * 1.4 - 0.2, jnp.float32)
    a = sample_volume_trilinear(data, pos)
    b = sample_volume_trilinear_packed(pack_corners(data), data.shape, pos)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_brick_matches_unpacked():
    from cpm_tpu.ops.sampling import (brick_row_index, brick_slots,
                                      brick_weights, pack_bricks)
    rng = np.random.default_rng(1)
    for scale in (2, 4):
        for shape in ((8, 8, 8), (9, 7, 5)):
            data = jnp.asarray(rng.random(shape), jnp.float32)
            # includes out-of-range positions: both paths CLAMP_TO_EDGE
            pos = jnp.asarray(rng.random((2000, 3)) * 1.4 - 0.2, jnp.float32)
            a = sample_volume_trilinear(data, pos)
            packed = pack_bricks(data, scale=scale)
            idx, local = brick_row_index(shape, pos, scale)
            b = jnp.sum(packed[idx][:, :brick_slots(scale)]
                        * brick_weights(local, scale), axis=-1)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6,
                                       err_msg=f"scale={scale} {shape}")


def test_brick_extra_column():
    from cpm_tpu.ops.sampling import brick_slots, brick_width, pack_bricks
    data = jnp.zeros((4, 4, 4), jnp.float32)
    extra = jnp.arange(64, dtype=jnp.float32).reshape(4, 4, 4)
    packed = pack_bricks(data, extra, scale=2)
    assert packed.shape == (8, brick_width(2))
    # brick (0,0,0) base voxel is (0,0,0); brick (1,1,1) base is (2,2,2)
    assert float(packed[0, brick_slots(2)]) == 0.0
    assert float(packed[-1, brick_slots(2)]) == float(extra[2, 2, 2])


def test_packed_edge_rows():
    data = jnp.arange(2 * 2 * 2, dtype=jnp.float32).reshape(2, 2, 2)
    packed = pack_corners(data)
    # Row for cell (z=1, y=1, x=1): all +1 neighbors edge-clamp to itself.
    np.testing.assert_allclose(np.asarray(packed[-1]), np.full(8, 7.0))
    # Row for cell (0,0,0) enumerates the full cube in k=dz*4+dy*2+dx order.
    np.testing.assert_allclose(np.asarray(packed[0]),
                               [0, 1, 2, 3, 4, 5, 6, 7])


def test_chunked_table_build_matches_pack_bricks():
    """build_trace_tables' donated z-slab chunk build == the one-shot
    pack_bricks layout (and forcing many tiny slabs changes nothing)."""
    import jax
    import jax.numpy as jnp

    from cpm_tpu.core.config import TracerConfig
    from cpm_tpu.core.types import TransferFunction, Volume
    from cpm_tpu.io import synthetic
    from cpm_tpu.ops import majorant as mj
    from cpm_tpu.ops import tracer as tr
    from cpm_tpu.ops.sampling import pack_bricks

    vol = Volume.from_data(synthetic.smoke_cloud(24, seed=1))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    cfg = TracerConfig(max_interactions=1, brick_scale=2)

    t_big = tr.build_trace_tables(vol, tf, cfg)
    t_small = tr.build_trace_tables(vol, tf, cfg, max_slab_bytes=1 << 14)
    np.testing.assert_array_equal(np.asarray(t_big.packed),
                                  np.asarray(t_small.packed))

    # Equivalence with the reference one-shot packer (same extras).
    maj, dist, mg, cme = tr._majorant_grids(vol, tf, cfg)
    d, h, w = vol.data.shape
    gz, gy, gx = maj.shape
    reps = [-(-s // g) for s, g in ((d, gz), (h, gy), (w, gx))]

    def upsample(g):
        return jnp.repeat(jnp.repeat(jnp.repeat(
            g, reps[0], 0), reps[1], 1), reps[2], 2)[:d, :h, :w]

    ref = pack_bricks(vol.data,
                      jnp.stack([upsample(maj), upsample(dist)], axis=-1),
                      scale=2)
    np.testing.assert_allclose(np.asarray(t_big.packed), np.asarray(ref),
                               rtol=0, atol=0)
