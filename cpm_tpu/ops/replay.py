"""Differentiable replay of the photon power chain from stored paths.

The wavefront tracer (ops/tracer.py) runs under ``lax.while_loop`` and is
not reverse-differentiable; its sampling decisions (Woodcock flights,
scatter-vs-absorb) are discrete anyway. The standard differentiable-
rendering answer is *detached sampling*: freeze the sampled trajectories
(``stop_gradient`` on interaction positions) and recompute every factor of
the deposited power as a differentiable function of the scene parameters.

The reference's per-interaction power recurrence
(modules/progressivephotonmapping/cl/photontracer.cl:158-197):

    power_in_i = p_{i-1} / max(opacity(x_i), 0.01)          (:176)
    deposit_i  = power_in_i * albedo_i  if scattered at x_i
               = power_in_i             if absorbed  at x_i (:185-193)
    p_i        = power_in_i * albedo_i                      (scatter)
    albedo_i   = scat.w / (scat.w + color.w)                (:174)

Whether interaction i scattered is recoverable from the stored photon map
itself: every interaction but the lane's last one scattered, and the last
one scattered iff the lane was not absorbed (exit_power < FLT_MAX,
cl/photontracer.cl:185-193 sentinel). Trajectories do not depend on the
emitted radiance at all (the scatter test is u < albedo), and the
replayed chain depends on it linearly — so gradients w.r.t. light power
are exact, and gradients w.r.t. density / TF opacity / scattering albedo
capture every term except trajectory movement (the detached-sampling
bias, documented in tests/test_grad.py).

Forward equality: replayed powers == the tracer's stored powers bit-for-
float (tested), so substituting them into the splat changes nothing at
the primal point.

Limitation (ADVICE round 4): ``no_single_scattering`` traces apply a
1/phase-pdf factor and an opacity/albedo chain step at a FIRST event whose
position is never stored, so the power chain cannot be replayed from the
photon map alone — :func:`replay_powers` raises on such configs rather
than silently diverging by ~4pi per photon.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cpm_tpu.core import constants
from cpm_tpu.core.types import (LightSamples, PhotonData, TransferFunction,
                                Volume)
from cpm_tpu.ops.sampling import sample_volume_trilinear

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("no_single_scattering",))
def replay_powers(volume: Volume, tf: TransferFunction,
                  tf_scattering: TransferFunction, photons: PhotonData,
                  light_samples: LightSamples,
                  no_single_scattering: bool = False) -> Array:
    """Recompute the (I, N, 3) deposited powers differentiably.

    Positions are detached inside; ``volume.data``, both TFs' colors and
    ``light_samples.powers`` flow gradients. Only valid interaction slots
    (position sentinel < FLT_MAX) produce nonzero output; others return
    the tracer's zero fill.

    Pass the tracer's ``no_single_scattering`` flag: such traces are not
    replayable (see module docstring) and raise here.
    """
    if no_single_scattering:
        raise NotImplementedError(
            "replay_powers cannot reconstruct the power chain of "
            "no_single_scattering traces: the first event's position (and "
            "hence its opacity/albedo factors) is not stored in the photon "
            "map (photontracer.cl:143-157 under -D NO_SINGLE_SCATTERING)")
    max_i, n = photons.positions.shape[:2]
    pos = jax.lax.stop_gradient(photons.positions)  # (I, N, 3)
    valid = pos[..., 0] < 1e30  # (I, N)
    # Number of deposits per lane and the absorbed flag.
    k = jnp.sum(valid.astype(jnp.int32), axis=0)  # (N,)
    absorbed = jax.lax.stop_gradient(photons.exit_power) >= 1e30  # (N,)

    safe_pos = jnp.where(valid[..., None], pos, 0.5)
    f = sample_volume_trilinear(volume.data, safe_pos)  # (I, N)
    opacity = tf.sample(f)[..., 3]
    scat_w = tf_scattering.sample(f)[..., 3]
    albedo = scat_w / jnp.maximum(scat_w + opacity, 1e-8)
    inv_op = 1.0 / jnp.maximum(opacity, 0.01)

    idx = jnp.arange(max_i, dtype=jnp.int32)[:, None]  # (I, 1)
    is_last = idx == (k[None, :] - 1)
    scattered = valid & (~is_last | ~absorbed[None, :])

    # Per-step multiplier applied to the running power AFTER interaction i.
    step_mult = jnp.where(valid, inv_op * jnp.where(scattered, albedo, 1.0),
                          1.0)
    # Running power BEFORE interaction i = p0 * prod_{j<i} step_mult_j.
    prefix = jnp.concatenate([
        jnp.ones((1, n), jnp.float32),
        jnp.cumprod(step_mult, axis=0)[:-1]], axis=0)  # (I, N)

    p0 = light_samples.powers / jnp.float32(max_i)  # (N, 3)
    deposit_mult = inv_op * jnp.where(scattered, albedo, 1.0)  # (I, N)
    powers = p0[None, :, :] * (prefix * deposit_mult)[..., None]
    return jnp.where(valid[..., None], powers, 0.0)


def replay_photons(volume: Volume, tf: TransferFunction,
                   tf_scattering: TransferFunction, photons: PhotonData,
                   light_samples: LightSamples,
                   no_single_scattering: bool = False) -> PhotonData:
    """``photons`` with powers replaced by the differentiable replay."""
    return photons.replace(powers=replay_powers(
        volume, tf, tf_scattering, photons, light_samples,
        no_single_scattering=no_single_scattering))
