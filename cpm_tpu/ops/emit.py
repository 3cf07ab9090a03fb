"""Light-sample emission: Light + 2D sample grid -> LightSamples.

Reference parity:
- directional sampler kernel  modules/lightcl/cl/directionallightsampler.cl:37-62
  (plane origin + u*tu + v*tv; power = radiance / (pdf/area))
- point/area/cone sampling    modules/importancesamplingcl/cl/light/light.cl:82-130
- ray/scene-span intersection modules/lightcl/cl/intersection/
  lightsamplemeshintersection.cl:36-58
- host orchestration          modules/lightcl/processors/
  directionallightsamplerclprocessor.cpp:49-90

The light-plane fit runs on host once per light-direction change; the sample
placement itself is jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.core import lights as L
from cpm_tpu.core.types import LightSamples
from cpm_tpu.ops import intersect, lightplane

Array = jnp.ndarray


def emit_directional(light: L.Light, samples: Array,
                     scene_points: np.ndarray | None = None,
                     box_min=0.0, box_max=1.0,
                     iteration: int | Array = 0) -> LightSamples:
    """Place samples on the fitted light plane of a directional light.

    Args:
      light: a DIRECTIONAL light.
      samples: (N, 4) stratified (u, v, _, pdf) grid.
      scene_points: (P, 3) scene bounding vertices; defaults to the unit box.
    """
    if scene_points is None:
        scene_points = lightplane.unit_box_corners(box_min, box_max)
    origin, tu, tv, area = lightplane.fit_light_plane(
        scene_points, np.asarray(light.direction))
    origin = jnp.asarray(origin)
    tu = jnp.asarray(tu)
    tv = jnp.asarray(tv)
    d = jnp.asarray(light.direction, jnp.float32)
    origins = origin[None, :] + tu[None, :] * samples[:, 0:1] + \
        tv[None, :] * samples[:, 1:2]
    directions = jnp.broadcast_to(d, origins.shape)
    # pdf = sample.pdf / area  =>  power = radiance * area / sample.pdf
    pdf = samples[:, 3] / jnp.float32(area)
    powers = jnp.asarray(light.radiance, jnp.float32)[None, :] / pdf[:, None]
    tspan = intersect.light_sample_box_intersection(
        origins, directions, box_min, box_max)
    return LightSamples(origins=origins, directions=directions, powers=powers,
                        tspan=tspan, iteration=jnp.int32(iteration))


def emit_point(light: L.Light, samples: Array, box_min=0.0, box_max=1.0,
               iteration: int | Array = 0) -> LightSamples:
    """Point light: uniform sphere directions from (u, v).

    light.cl:84-91 — wi = -uniformSampleSphere(uv), pdf = 1/(4pi),
    power = radiance / pdf.
    """
    u, v = samples[:, 0], samples[:, 1]
    z = 1.0 - 2.0 * u
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * v
    sphere = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    directions = -sphere
    origins = jnp.broadcast_to(
        jnp.asarray(light.position, jnp.float32), directions.shape)
    pdf = 1.0 / (4.0 * np.pi)
    powers = jnp.broadcast_to(
        jnp.asarray(light.radiance, jnp.float32) / pdf, directions.shape)
    tspan = intersect.light_sample_box_intersection(
        origins, directions, box_min, box_max)
    return LightSamples(origins=origins, directions=directions, powers=powers,
                        tspan=tspan, iteration=jnp.int32(iteration))


def emit_cone(light: L.Light, samples: Array, box_min=0.0, box_max=1.0,
              iteration: int | Array = 0) -> LightSamples:
    """Cone light: uniform cone sampling around the light axis.

    light.cl:111-121 — pdf = 1/(2pi(1-cosFov));
    power = z^5 * radiance / pdf (the reference's z-falloff weighting).
    """
    u, v = samples[:, 0], samples[:, 1]
    cos_fov = jnp.float32(light.cos_fov)
    z = 1.0 - u * (1.0 - cos_fov)  # cos(theta) in [cosFov, 1]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * v
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    axis = jnp.asarray(light.direction, jnp.float32)
    from cpm_tpu.ops.phase import _orthonormal_frame
    t, b = _orthonormal_frame(axis)
    directions = (t[None] * local[:, 0:1] + b[None] * local[:, 1:2]
                  + axis[None] * local[:, 2:3])
    origins = jnp.broadcast_to(
        jnp.asarray(light.position, jnp.float32), directions.shape)
    pdf = 1.0 / (2.0 * np.pi * jnp.maximum(1.0 - cos_fov, 1e-6))
    powers = (z ** 5)[:, None] * jnp.asarray(light.radiance, jnp.float32)[None] / pdf
    tspan = intersect.light_sample_box_intersection(
        origins, directions, box_min, box_max)
    return LightSamples(origins=origins, directions=directions, powers=powers,
                        tspan=tspan, iteration=jnp.int32(iteration))


def emit_area(light: L.Light, samples: Array, key: Array | None = None,
              box_min=0.0, box_max=1.0, iteration: int | Array = 0) -> LightSamples:
    """Area light: samples across the rectangle aimed at random box points.

    light.cl:92-101 — origin on the rectangle, direction toward a random
    point inside the scene box, pdf = area.
    """
    u, v = samples[:, 0], samples[:, 1]
    n = jnp.asarray(light.direction, jnp.float32)
    from cpm_tpu.ops.phase import _orthonormal_frame
    t, b = _orthonormal_frame(n)
    size = jnp.asarray(light.size, jnp.float32)
    center = jnp.asarray(light.position, jnp.float32)
    origins = (center[None] + t[None] * (size[0] * (u - 0.5))[:, None]
               + b[None] * (size[1] * (v - 0.5))[:, None])
    if key is None:
        key = jax.random.PRNGKey(0)
    lo = jnp.broadcast_to(jnp.asarray(box_min, jnp.float32), (3,))
    hi = jnp.broadcast_to(jnp.asarray(box_max, jnp.float32), (3,))
    target = lo + (hi - lo) * jax.random.uniform(key, origins.shape)
    directions = target - origins
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    area = size[0] * size[1]
    powers = jnp.broadcast_to(
        jnp.asarray(light.radiance, jnp.float32) / area, origins.shape)
    tspan = intersect.light_sample_box_intersection(
        origins, directions, box_min, box_max)
    return LightSamples(origins=origins, directions=directions, powers=powers,
                        tspan=tspan, iteration=jnp.int32(iteration))


def emit(light: L.Light, samples: Array, key: Array | None = None,
         scene_points: np.ndarray | None = None, box_min=0.0, box_max=1.0,
         iteration: int | Array = 0) -> LightSamples:
    """Dispatch on (static) light type."""
    if light.type == L.DIRECTIONAL:
        return emit_directional(light, samples, scene_points, box_min, box_max,
                                iteration)
    if light.type == L.POINT:
        return emit_point(light, samples, box_min, box_max, iteration)
    if light.type == L.CONE:
        return emit_cone(light, samples, box_min, box_max, iteration)
    if light.type == L.AREA:
        return emit_area(light, samples, key, box_min, box_max, iteration)
    raise ValueError(f"unknown light type {light.type}")
