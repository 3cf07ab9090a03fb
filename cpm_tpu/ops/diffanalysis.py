"""Temporal difference analysis of volume sequences.

Reference parity: DynamicVolumeDifferenceAnalysis
(modules/uniformgridcl/processors/dynamicvolumedifferenceanalysis.cpp:60-104
and the templated dispatcher in dynamicvolumedifferenceanalysis.h:96-156):
for each cyclic time-step pair (t, t+1), the per-cell MEAN absolute voxel
difference normalized by the data range -> a float uniform grid per step.

TPU-first: the CPU per-cell loops become avg-pool reductions
(``lax.reduce_window``) over |v_{t+1} - v_t|, one vmap across the sequence.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("cell_size",))
def volume_difference_grids(sequence: Array, cell_size: int = 8,
                            data_range: float = 1.0) -> Array:
    """(T, D, H, W) sequence -> (T, gz, gy, gx) difference grids.

    Grid t holds the mean |v_{(t+1) mod T} - v_t| per cell / data_range
    (cyclic pairing like the reference's sequence handling).
    """
    nxt = jnp.roll(sequence, -1, axis=0)
    diff = jnp.abs(nxt - sequence) / data_range
    window = (1,) + (cell_size,) * 3
    sums = jax.lax.reduce_window(
        diff, jnp.float32(0.0), jax.lax.add, window, window, "SAME")
    # Mean over actual cell voxel counts (border cells are partial).
    ones = jnp.ones_like(diff[:1])
    counts = jax.lax.reduce_window(
        ones, jnp.float32(0.0), jax.lax.add, window, window, "SAME")
    return sums / counts
