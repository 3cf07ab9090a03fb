"""Selective-recomputation photon selection: threshold + count + sort +
budget, the chain the reference builds from clogs primitives.

Reference parity: ProgressivePhotonTracerCL::process() steps
(progressivephotontracercl.cpp:265-540):
  thresholdKernel (cl/threshold.cl:32-40)   -> importance > 0 mask
  clogs::Reduce                             -> count to recompute
  indexToBufferKernel (cl/indextobuffer.cl) -> iota values
  clogs::Radixsort (keys=importance)        -> priority order
  budget = min(remaining, maxPhotonsPerUpdate% * N)
            (progressivephotontracercl.cpp:374-388)
  optional spatial re-sort of the selected indices (:425-475)
  resetPhotonImportance on computed photons (fill 2^31-1 sentinel,
            progressivephotontracercl.cpp:529,607-611) so a progressive
            drain never re-selects an already-retraced photon

TPU-first: one descending argsort over float keys replaces the subtractive
uint radix trick; the budget is a *static* buffer size B with a validity
mask (fixed shapes under jit, SURVEY.md §7 "hard parts"); the sentinel
reset becomes an explicit ``exclude`` mask carried in PhotonMapState.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("budget", "spatial_sort"))
def select_photons_to_recompute(importance: Array, budget: int,
                                exclude: Array | None = None,
                                spatial_sort: bool = True):
    """Pick the top-``budget`` photons by importance.

    Args:
      importance: (N,) float path importance (0 = no recompute needed).
      budget: static max photons per update (ceil(% * N) at trace time).
      exclude: optional (N,) bool — photons already retraced this round
        (the analog of the reference's resetPhotonImportance sentinel fill,
        progressivephotontracercl.cpp:607-611); their importance is zeroed
        so a multi-batch drain visits each photon at most once.
      spatial_sort: re-sort the selected ids ascending so the retrace batch
        is memory-coherent (the reference's "spatial sorting" index sort,
        :425-475 — light-sample id order approximates spatial order on the
        emission plane).

    Returns:
      (indices (B,), valid (B,), n_remaining ()): ids to retrace, their
      validity mask, and how many flagged photons remain *after* this batch
      (drives progressive draining, :534-540).
    """
    n = importance.shape[0]
    if exclude is not None:
        importance = jnp.where(exclude, 0.0, importance)
    n_flagged = jnp.sum((importance > 0.0).astype(jnp.int32))
    # top_k instead of a full descending argsort: only the budget-sized
    # head is ever used, and at 4M photons (BASELINE config 5) the full
    # sort is the difference between a working and an OOM-ing step. Ties
    # resolve lowest-index-first in both formulations.
    _, indices = jax.lax.top_k(importance, min(budget, n))
    ranks = jnp.arange(budget, dtype=jnp.int32)
    indices = indices[jnp.minimum(ranks, indices.shape[0] - 1)]
    indices = indices.astype(jnp.int32)
    valid = ranks < n_flagged
    if spatial_sort:
        # Invalid lanes sort to the end (key = n).
        skey = jnp.where(valid, indices, n)
        perm = jnp.argsort(skey)
        indices = indices[perm]
        valid = valid[perm]
    n_remaining = jnp.maximum(n_flagged - budget, 0)
    return indices, valid, n_remaining
