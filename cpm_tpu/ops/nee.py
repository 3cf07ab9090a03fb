"""Next-event-estimation light sampling (sample a light toward a point).

Reference parity: ``sampleLightSource``
(modules/importancesamplingcl/cl/light/lightsampling.cl:59-140) — the NEE
companion of the emission-side samplers. The reference ships it bitrotted
and unwired (its kernel references an undeclared ``lightSource`` and is
not compiled in the released workspace, SURVEY §2.2); the semantics
implemented here follow the readable per-type branches:

- POINT:       power = radiance / |p - o|^2, pdf = 1
- AREA:        uniform position on the quad; pdf = dist^2 / (cosL * A),
               zero when the surface points away
- DIRECTIONAL: fixed direction, power = radiance, pdf = 1
- CONE:        like point but zero outside the cone aperture

Batched TPU form: one call evaluates ALL query points against one light
(dense VPU math); light-type dispatch is static (Python), matching the
config-specialization pattern of the emit stage. Combine with
:func:`cpm_tpu.ops.gather.transmittance_to_point` for a single-scattering
estimate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpm_tpu.core import lights as L

Array = jnp.ndarray


def sample_light_toward(light: L.Light, positions: Array,
                        key: Array | None = None):
    """Sample ``light`` toward each query position.

    Args:
      positions: (N, 3) texture-space shading points.
      key: PRNG key; needed for AREA lights (position on the quad).

    Returns:
      (wi, radiance, pdf, origin): (N, 3) direction light->point (unit),
      (N, 3) incident radiance (before transmittance), (N,) pdf, and
      (N, 3) the sampled light origin (for visibility/transmittance rays).
    """
    n = positions.shape[0]
    rad = jnp.asarray(light.radiance, jnp.float32)
    pos_l = jnp.asarray(light.position, jnp.float32)
    dir_l = jnp.asarray(light.direction, jnp.float32)

    if light.type == L.DIRECTIONAL:
        wi = jnp.broadcast_to(dir_l, (n, 3))
        # Origin pushed far back along -wi so transmittance rays cover the
        # whole volume span.
        origin = positions - 10.0 * wi
        power = jnp.broadcast_to(rad, (n, 3))
        pdf = jnp.ones((n,), jnp.float32)
        return wi, power, pdf, origin

    if light.type in (L.POINT, L.CONE):
        delta = positions - pos_l
        dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
        wi = delta / jnp.sqrt(dist2)[:, None]
        power = rad[None, :] / dist2[:, None]
        pdf = jnp.ones((n,), jnp.float32)
        if light.type == L.CONE:
            inside = jnp.sum(wi * dir_l[None, :], axis=-1) \
                >= jnp.float32(light.cos_fov)
            power = jnp.where(inside[:, None], power, 0.0)
            pdf = jnp.where(inside, pdf, 0.0)
        return wi, power, pdf, jnp.broadcast_to(pos_l, (n, 3))

    if light.type == L.AREA:
        if key is None:
            uv = jnp.full((n, 2), 0.5)
        else:
            uv = jax.random.uniform(key, (n, 2))
        # Orthonormal frame around the area normal.
        nrm = dir_l / jnp.linalg.norm(dir_l)
        up = jnp.where(jnp.abs(nrm[2]) < 0.9,
                       jnp.array([0.0, 0.0, 1.0]),
                       jnp.array([1.0, 0.0, 0.0]))
        t1 = jnp.cross(up, nrm)
        t1 = t1 / jnp.linalg.norm(t1)
        t2 = jnp.cross(nrm, t1)
        size = jnp.asarray(light.size, jnp.float32)
        origin = (pos_l[None, :]
                  + (uv[:, :1] - 0.5) * size[0] * t1[None, :]
                  + (uv[:, 1:] - 0.5) * size[1] * t2[None, :])
        delta = positions - origin
        dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
        wi = delta / jnp.sqrt(dist2)[:, None]
        cos_l = jnp.sum(wi * nrm[None, :], axis=-1)
        area = size[0] * size[1]
        facing = cos_l > 0.0
        pdf = jnp.where(facing, dist2 / jnp.maximum(cos_l * area, 1e-12),
                        0.0)
        power = jnp.where(facing[:, None], rad[None, :], 0.0)
        return wi, power, pdf, origin

    raise ValueError(f"unknown light type {light.type}")


def nee_single_scatter(light: L.Light, volume, tf, positions: Array,
                       key: Array | None = None,
                       n_steps: int = 64) -> Array:
    """Transmittance-weighted NEE estimate of direct in-scattered radiance
    at each position: L = T(origin -> p) * power / max(pdf, eps). The
    phase-function factor is the caller's (it depends on the outgoing
    direction)."""
    from cpm_tpu.ops.gather import transmittance_to_point
    wi, power, pdf, origin = sample_light_toward(light, positions, key)
    trans = transmittance_to_point(volume, tf, origin, positions,
                                   n_steps=n_steps)
    return power * (trans / jnp.maximum(pdf, 1e-12))[:, None]
