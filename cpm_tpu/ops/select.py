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
    # Full descending stable sort, then take the budget head: measured on
    # the v5e, lax.top_k costs 188 ms for (4.2M, 420k) while
    # sort_key_val of the same 4.2M keys is 32 ms — top_k's partial-
    # selection lowering loses to the radix-ish full sort as soon as k is
    # a few percent of n, and the sort wins at 65k too. Ties resolve
    # lowest-index-first in both formulations (stable sort of -importance
    # == top_k's tie rule).
    _, sorted_idx = jax.lax.sort_key_val(
        -importance, jnp.arange(n, dtype=jnp.int32))
    ranks = jnp.arange(budget, dtype=jnp.int32)
    indices = sorted_idx[jnp.minimum(ranks, n - 1)].astype(jnp.int32)
    valid = ranks < n_flagged
    if spatial_sort:
        # Invalid lanes sort to the end (key = n).
        skey = jnp.where(valid, indices, n)
        perm = jnp.argsort(skey)
        indices = indices[perm]
        valid = valid[perm]
    n_remaining = jnp.maximum(n_flagged - budget, 0)
    return indices, valid, n_remaining
