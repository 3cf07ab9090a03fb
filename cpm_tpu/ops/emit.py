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

from functools import partial

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


def build_emission_guide(importance_grid, light: L.Light,
                         n_u: int = 64, n_v: int = 64, n_steps: int = 32,
                         scene_points: np.ndarray | None = None,
                         box_min=0.0, box_max=1.0) -> Array:
    """(n_v, n_u) guide map for importance-guided emission of a
    DIRECTIONAL light (BASELINE config 3 / north star).

    Each guide texel integrates the recomputation-importance grid
    (ops/importance.py) along the light ray through the corresponding
    point of the fitted light plane: texels whose photons would cross
    important volume regions score high. Feed the result to
    :func:`cpm_tpu.ops.sampling.warp_samples_2d`; the pdf bookkeeping
    there keeps ``power = radiance * area / pdf``
    (directionallightsampler.cl:37-62) unbiased for any guide.
    """
    if light.type != L.DIRECTIONAL:
        raise ValueError("guided emission currently supports directional "
                         "lights (the BASELINE config-3 setup)")
    if scene_points is None:
        scene_points = lightplane.unit_box_corners(box_min, box_max)
    origin, tu, tv, _ = lightplane.fit_light_plane(
        scene_points, np.asarray(light.direction))
    return _emission_guide_jit(
        importance_grid.data, jnp.asarray(origin), jnp.asarray(tu),
        jnp.asarray(tv), jnp.asarray(light.direction, jnp.float32),
        n_u, n_v, n_steps, jnp.asarray(box_min, jnp.float32),
        jnp.asarray(box_max, jnp.float32))


def _emission_guide_jit(grid: Array, origin: Array, tu: Array, tv: Array,
                        d: Array, n_u: int, n_v: int, n_steps: int,
                        box_min: Array, box_max: Array) -> Array:
    us = (jnp.arange(n_u, dtype=jnp.float32) + 0.5) / n_u
    vs = (jnp.arange(n_v, dtype=jnp.float32) + 0.5) / n_v
    o = (origin[None, None, :] + tu[None, None, :] * us[None, :, None]
         + tv[None, None, :] * vs[:, None, None])  # (Nv, Nu, 3)
    o = o.reshape(-1, 3)
    dirs = jnp.broadcast_to(d, o.shape)
    hit, t0, t1 = intersect.ray_box(o, dirs, box_min, box_max)
    ts = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps
    t = t0[None, :] + ts[:, None] * (t1 - t0)[None, :]  # (K, M)
    p = o[None, :, :] + t[..., None] * dirs[None, :, :]
    gz, gy, gx = grid.shape
    c = jnp.clip(jnp.floor(p * jnp.array([gx, gy, gz], jnp.float32)),
                 0.0, jnp.array([gx - 1, gy - 1, gz - 1], jnp.float32)
                 ).astype(jnp.int32)
    vals = grid.reshape(-1)[(c[..., 2] * gy + c[..., 1]) * gx + c[..., 0]]
    span = jnp.maximum(t1 - t0, 0.0) * hit.astype(jnp.float32)
    guide = jnp.mean(vals, axis=0) * span
    return guide.reshape(n_v, n_u)


_emission_guide_jit = jax.jit(
    _emission_guide_jit, static_argnames=("n_u", "n_v", "n_steps"))


@partial(jax.jit, static_argnames=("n_u", "n_v"))
def emission_guide_from_wave(uv: Array, pdf: Array, deposits: Array,
                             n_u: int = 64, n_v: int = 64) -> Array:
    """Adaptive emission guide: measured CONTRIBUTION per light-plane bin.

    The projection guide (:func:`build_emission_guide`) steers photons at
    the recomputation importance, which is the right signal after a TF
    edit but is NOT proportional to deposited energy — on broad scenes it
    can RAISE variance (floor-region photons carry 1/floor weights that
    spike when they scatter into bright regions; measured on the config-3
    CT head). The variance-minimizing density is the contribution itself,
    so this builds the guide from a traced wave: each sample's deposited
    luminance times its emission pdf is an unbiased estimate of the
    contribution C(u, v) at its plane position; bin-averaging over a
    (n_v, n_u) grid estimates C as a piecewise-constant density (the
    classic two-pass adaptive importance-sampling scheme; progressive
    waves can re-estimate every wave).

    Args:
      uv: (N, 2) plane coordinates the samples were EMITTED at (warped).
      pdf: (N,) their emission pdfs (samples[:, 3] after any warp).
      deposits: (I, N, 3) stored deposit powers (PhotonData.powers).
    """
    lum = jnp.sum(jnp.abs(deposits), axis=(0, 2))  # (N,) total luminance
    lum = jnp.where(jnp.isfinite(lum), lum, 0.0)
    contrib = lum * pdf
    iu = jnp.clip((uv[:, 0] * n_u).astype(jnp.int32), 0, n_u - 1)
    iv = jnp.clip((uv[:, 1] * n_v).astype(jnp.int32), 0, n_v - 1)
    flat = iv * n_u + iu
    tot = jnp.zeros(n_v * n_u, jnp.float32).at[flat].add(contrib)
    cnt = jnp.zeros(n_v * n_u, jnp.float32).at[flat].add(1.0)
    return (tot / jnp.maximum(cnt, 1.0)).reshape(n_v, n_u)


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
