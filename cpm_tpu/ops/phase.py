"""Phase functions: evaluation and direction sampling.

Reference parity: Inviwo's ``shading/shading.cl`` (external dependency of the
reference kernels) provides Henyey-Greenstein, Schlick and isotropic phase
functions selected by ``ShadingType``; the photon tracer samples a new
direction with two uniforms via ``sampleShadingFunction``
(modules/progressivephotonmapping/cl/photontracer.cl:50-67).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

ISOTROPIC = 0
HENYEY_GREENSTEIN = 1
SCHLICK = 2

INV_4PI = 1.0 / (4.0 * np.pi)


def isotropic_phase() -> float:
    return INV_4PI


def hg_phase(cos_theta: Array, g: Array) -> Array:
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 - 2.0 * g * cos_theta, 1e-8)
    return INV_4PI * (1.0 - g2) / (denom * jnp.sqrt(denom))


def schlick_phase(cos_theta: Array, k: Array) -> Array:
    denom = jnp.maximum(1.0 + k * cos_theta, 1e-4)
    return INV_4PI * (1.0 - k * k) / (denom * denom)


def _orthonormal_frame(w: Array):
    """Build (u, v) orthogonal to w; w is (..., 3) normalized."""
    sign = jnp.where(w[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + w[..., 2])
    b = w[..., 0] * w[..., 1] * a
    u = jnp.stack([1.0 + sign * w[..., 0] ** 2 * a, sign * b,
                   -sign * w[..., 0]], axis=-1)
    v = jnp.stack([b, sign + w[..., 1] ** 2 * a, -w[..., 1]], axis=-1)
    return u, v


def _from_cos_theta(wi: Array, cos_theta: Array, u2: Array) -> Array:
    """Direction at polar angle acos(cos_theta) around wi, azimuth 2*pi*u2."""
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * np.pi * u2
    t, b = _orthonormal_frame(wi)
    return (t * (sin_theta * jnp.cos(phi))[..., None]
            + b * (sin_theta * jnp.sin(phi))[..., None]
            + wi * cos_theta[..., None])


def sample_isotropic(wi: Array, u1: Array, u2: Array):
    cos_theta = 1.0 - 2.0 * u1
    wo = _from_cos_theta(wi, cos_theta, u2)
    pdf = jnp.full(u1.shape, INV_4PI, jnp.float32)
    return wo, pdf


def sample_hg(wi: Array, g: Array, u1: Array, u2: Array):
    g = jnp.asarray(g, jnp.float32)
    safe = jnp.abs(g) > 1e-3
    gs = jnp.where(safe, g, 1.0)  # avoid /0 in the unused branch
    sqr = (1.0 - gs * gs) / (1.0 + gs - 2.0 * gs * u1)
    cos_hg = (1.0 + gs * gs - sqr * sqr) / (2.0 * gs)
    cos_theta = jnp.where(safe, cos_hg, 1.0 - 2.0 * u1)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    wo = _from_cos_theta(wi, cos_theta, u2)
    pdf = jnp.where(safe, hg_phase(cos_theta, g), INV_4PI)
    return wo, pdf


def sample_schlick(wi: Array, k: Array, u1: Array, u2: Array):
    k = jnp.asarray(k, jnp.float32)
    safe = jnp.abs(k) > 1e-3
    ks = jnp.where(safe, k, 1.0)
    cos_sl = (2.0 * u1 + ks - 1.0) / (2.0 * ks * u1 - ks + 1.0)
    cos_theta = jnp.where(safe, cos_sl, 1.0 - 2.0 * u1)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    wo = _from_cos_theta(wi, cos_theta, u2)
    pdf = jnp.where(safe, schlick_phase(cos_theta, k), INV_4PI)
    return wo, pdf


def sample_phase(phase_type: int, wi: Array, g: Array, u1: Array, u2: Array):
    """Dispatch on a *static* phase type (compile-time specialization, the
    analog of the reference's ShadingType kernel argument)."""
    if phase_type == ISOTROPIC:
        return sample_isotropic(wi, u1, u2)
    if phase_type == HENYEY_GREENSTEIN:
        return sample_hg(wi, g, u1, u2)
    if phase_type == SCHLICK:
        return sample_schlick(wi, g, u1, u2)
    raise ValueError(f"unknown phase type {phase_type}")
