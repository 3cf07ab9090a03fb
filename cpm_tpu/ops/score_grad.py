"""Score-function trajectory gradients for the photon tracer.

The detached-sampling replay (ops/replay.py) differentiates every factor of
the deposited POWER but freezes the sampled trajectories, so it misses the
dependence of the free-flight/acceptance/scatter DECISIONS on the scene —
e.g. d/d(density) of "how far photons fly" is exactly what it cannot see
(BASELINE north star; SURVEY §7 "hard parts"; VERDICT r4 missing #2).

This module adds those terms with the standard score-function (likelihood-
ratio) estimator over the tracer's recorded event tape
(ops/tracer.py:TraceEvents):

    d/dθ E[L] = E[ dL/dθ |pathwise  +  L_lane · d/dθ log p_θ(trajectory) ]

With the majorant FROZEN (delta tracking is unbiased for any majorant
bound, so treating the recorded per-event majorant as a θ-independent
constant keeps the estimator unbiased AND makes log p differentiable), the
θ-dependent factors of a trajectory's probability are exactly:

    null collision at x:     1 - σ(x)/σ̄          (rejected flight)
    accepted collision at x: σ(x)/σ̄
    scattered (n < max):     albedo(x)
    absorbed by the test:    1 - albedo(x)
    forced stop / pre-scatter event: acceptance factor only

where σ = TF opacity of the trilinear volume fetch and albedo =
scat/(scat+σ) (photontracer.cl:141-197 semantics). Flight lengths are
Exp(σ̄)-distributed and boundary/empty-space clamps are deterministic given
the frozen majorant geometry — neither contributes a θ-dependent factor.

Caveats (documented, asserted where cheap):
- the score estimator needs σ̄ strictly above σ along important paths
  (tau_max > 1 or a dilated majorant grid): at σ = σ̄ null events vanish
  and the interchange argument degenerates;
- lanes whose tape overflowed the static cap are EXCLUDED from the score
  term (their pathwise term remains) — check ``TraceEvents.counts``;
- ``no_single_scattering`` is unsupported (as in replay).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpm_tpu.core.types import (LightSamples, PhotonData, TransferFunction,
                                Volume)
from cpm_tpu.ops import replay as replay_mod
from cpm_tpu.ops.sampling import sample_volume_trilinear
from cpm_tpu.ops.tracer import (EVT_ABSORB, EVT_NULL, EVT_SCATTER,
                                TraceEvents)

Array = jnp.ndarray

_EPS = 1e-7


@jax.jit
def log_prob_lanes(events: TraceEvents, volume: Volume, tf: TransferFunction,
                   tf_scattering: TransferFunction) -> Array:
    """(N,) differentiable log-probability of each lane's recorded
    trajectory w.r.t. the scene parameters (positions/majorants frozen).
    Overflowed lanes (counts > E) return 0 (excluded from the score term).
    """
    pos = jax.lax.stop_gradient(events.positions)  # (N, E, 3)
    maj = jax.lax.stop_gradient(events.majorants)
    n, e = events.majorants.shape
    valid = (jnp.arange(e, dtype=jnp.int32)[None, :]
             < jnp.minimum(events.counts, e)[:, None])

    f = sample_volume_trilinear(volume.data, pos)  # (N, E)
    op = tf.sample_opacity(f)
    scat = tf_scattering.sample_opacity(f)
    albedo = jnp.clip(scat / jnp.maximum(scat + op, 1e-8), _EPS, 1.0 - _EPS)
    ratio = jnp.clip(op / jnp.maximum(maj, 1e-12), _EPS, 1.0 - _EPS)

    t = events.types
    term = jnp.where(
        t == EVT_NULL, jnp.log1p(-ratio),
        jnp.log(ratio) + jnp.where(
            t == EVT_SCATTER, jnp.log(albedo),
            jnp.where(t == EVT_ABSORB, jnp.log1p(-albedo), 0.0)))
    term = jnp.where(valid, term, 0.0)
    lp = jnp.sum(term, axis=1)
    return jnp.where(events.counts <= e, lp, 0.0)


def make_surrogate(volume: Volume, tf: TransferFunction,
                   tf_scattering: TransferFunction,
                   light_samples: LightSamples, photons: PhotonData,
                   events: TraceEvents, loss_from_deposits,
                   loss_takes_scene: bool = False):
    """Build ``surrogate(volume, tf, tf_scattering, light_samples)`` whose
    jax.grad is the FULL (pathwise + trajectory) gradient estimator of
    ``E[loss_from_deposits(replayed deposits)]``.

    ``loss_from_deposits`` maps the (I, N, 3) deposit powers to a scalar
    (typically splat -> render -> image loss; everything downstream of the
    deposits is already reverse-differentiable). With
    ``loss_takes_scene=True`` it is called as
    ``loss(dep, volume, tf, tf_scattering, light_samples)`` so the scene
    parameters' DIRECT influence on the loss (e.g. the render-side TF
    classification of the camera pass) also flows — omitting it silently
    drops that gradient term. The per-lane score weights
    λ_lane = Σ_i (∂L/∂d_i) · d_i are evaluated once at the build point
    (first-order surrogate, the standard REINFORCE construction).
    """
    if loss_takes_scene:
        def loss_fn(dep, v, t, s, l):
            return loss_from_deposits(dep, v, t, s, l)
    else:
        def loss_fn(dep, v, t, s, l):
            return loss_from_deposits(dep)

    dep0 = replay_mod.replay_powers(volume, tf, tf_scattering, photons,
                                    light_samples)
    _, pullback = jax.vjp(
        lambda d: loss_fn(d, volume, tf, tf_scattering, light_samples),
        dep0)
    cot = pullback(jnp.float32(1.0))[0]  # (I, N, 3)
    w_lane = jax.lax.stop_gradient(jnp.sum(cot * dep0, axis=(0, 2)))  # (N,)

    def surrogate(volume_, tf_, tf_scattering_, light_samples_):
        dep = replay_mod.replay_powers(volume_, tf_, tf_scattering_,
                                       photons, light_samples_)
        lp = log_prob_lanes(events, volume_, tf_, tf_scattering_)
        return (loss_fn(dep, volume_, tf_, tf_scattering_, light_samples_)
                + jnp.sum(w_lane * lp))

    return surrogate


def trajectory_gradients(volume: Volume, tf: TransferFunction,
                         tf_scattering: TransferFunction,
                         light_samples: LightSamples, photons: PhotonData,
                         events: TraceEvents, loss_from_deposits):
    """Convenience: the full gradient estimator of
    E[loss_from_deposits(deposits)] w.r.t. (volume, tf, tf_scattering,
    light_samples) as a pytree-of-pytrees, plus the loss value."""
    sur = make_surrogate(volume, tf, tf_scattering, light_samples, photons,
                         events, loss_from_deposits)
    val = loss_from_deposits(replay_mod.replay_powers(
        volume, tf, tf_scattering, photons, light_samples))
    # allow_int: pytrees carry int leaves (iteration counters) which get
    # float0 tangents.
    grads = jax.grad(sur, argnums=(0, 1, 2, 3), allow_int=True)(
        volume, tf, tf_scattering, light_samples)
    return val, grads
