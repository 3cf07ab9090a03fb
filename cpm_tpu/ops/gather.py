"""Camera ray-march compositing with light-volume sampling.

Reference parity: Inviwo's ``LightingRaycaster`` consuming the light volume
(wired in workspaces/CorrelatedPhotonMappingSingleVolume.inv) together with
``EntryExitPoints``/``CubeProxyGeometry``. Re-designed as one fused jitted
ray-march: per-pixel entry/exit spans against the texture-space unit box,
then a fixed-trip-count ``lax.fori_loop`` over depth steps in which EVERY
pixel samples density, transfer function and light volume — dense (H*W)
vector work per step, ideal for the VPU/XLA fusion.

Physics: emission-absorption DVR; extinction = TF opacity *
SAMPLING_BASE_INTERVAL_RCP (transmittance.cl:40), emitted radiance =
TF color * (irradiance + ambient). The light volume already carries the
isotropic phase factor and irradiance normalization (splat stage), matching
what the reference's raycaster receives.

Performance note (re-measured round 4 with honest per-rep host-readback
sync, utils/benchmark.py): XLA gathers are ~0.11 G lookups/s in EVERY
formulation — dense top-level batches and fori_loop bodies alike (round 3's
"11-46 G dense fast path" was a benchmark-sync artifact;
jax.block_until_ready does not reliably block on the axon tunnel backend).
At ~13 gathers/sample that makes any gather-based march ~28 s per
512^2 x 128^3 frame. The production renderer is therefore the shear-warp
MXU sweep (:mod:`cpm_tpu.ops.sweep_render`, 35 ms/frame honest); this
module keeps the gather marchers as the physics oracle and as the fallback
for cameras the sweep cannot handle (eye inside the volume).
:func:`render_rays` is the dense form (reverse-differentiable, modestly
faster end-to-end than the loop); :func:`render_rays_loop` the sequential
twin used for allclose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cpm_tpu.core import constants
from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import RenderConfig
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.ops import intersect
from cpm_tpu.ops.sampling import (sample_volume_trilinear,
                                  sample_volume_trilinear_vec)

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("config", "n_steps"))
def render(volume: Volume, tf: TransferFunction, light_volume: Array,
           camera: Camera, config: RenderConfig,
           n_steps: int | None = None) -> Array:
    """Render an (H, W, 4) RGBA image.

    ``light_volume`` is the (D, H, W, 3) irradiance grid from the splat
    stage. A fixed number of steps with masking keeps shapes static.
    """
    h, w = config.height, config.width
    origins, dirs = camera.rays(w, h)
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    dim_max = max(volume.data.shape)
    if n_steps is None:
        n_steps = int(3 ** 0.5 * dim_max * config.sampling_rate) + 1
    img = render_rays(volume, tf, light_volume, o, d, n_steps, config.ambient)
    return img.reshape(h, w, 4)


def _march_chunk(volume: Volume, tf: TransferFunction, light_volume: Array,
                 o: Array, d: Array, t0: Array, t1: Array, n_steps: int,
                 dt: float, ambient: float) -> Array:
    """Dense march of one (C, 3) ray chunk: one big (C, S) sample batch.

    Same math as the sequential marcher: per-step transmittance
    exp(-sigma*dt) with steps outside [t0, t1] contributing nothing —
    expressed as tau_i = 0 outside, front-to-back compositing via the
    exclusive cumsum of tau along the step axis.
    """
    sigma_scale = constants.SAMPLING_BASE_INTERVAL_RCP
    s = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) * dt  # (S,)
    t = t0[:, None] + s[None, :]  # (C, S)
    inside = t <= t1[:, None]
    p = o[:, None, :] + t[..., None] * d[:, None, :]  # (C, S, 3)
    vol = sample_volume_trilinear(volume.data, p)  # (C, S)
    color = tf.sample(vol)  # (C, S, 4)
    light = sample_volume_trilinear_vec(light_volume, p)  # (C, S, 3)
    tau = jnp.where(inside, color[..., 3] * sigma_scale * dt, 0.0)
    seg_a = 1.0 - jnp.exp(-tau)  # per-step alpha; 0 outside the span
    trans = jnp.exp(-(jnp.cumsum(tau, axis=1) - tau))  # exclusive prefix
    emit = color[..., :3] * (light + ambient)
    rgb = jnp.sum((trans * seg_a)[..., None] * emit, axis=1)
    alpha = 1.0 - jnp.exp(-jnp.sum(tau, axis=1))
    return jnp.concatenate([rgb, alpha[:, None]], axis=-1)


@partial(jax.jit, static_argnames=("n_steps", "ambient", "chunk"))
def render_rays(volume: Volume, tf: TransferFunction, light_volume: Array,
                o: Array, d: Array, n_steps: int,
                ambient: float = 0.05, chunk: int | None = None) -> Array:
    """Ray-march a flat (P, 3) ray bundle -> (P, 4) RGBA, dense-batched.

    The shard-level primitive: :func:`render` maps pixels onto it on one
    chip; the parallel layer shard_maps it over a pixel-sharded mesh axis.
    ``chunk`` bounds the (chunk * n_steps) sample batch materialized per
    unrolled step (default targets ~2^23 samples, ~700 MB of temporaries).
    """
    hit, t0, t1 = intersect.ray_box(o, d)
    t0 = jnp.where(hit, t0, 0.0)
    t1 = jnp.where(hit, t1, -1.0)
    dt = (3 ** 0.5) / (n_steps - 1) if n_steps > 1 else 1.0

    npix = o.shape[0]
    if chunk is None:
        chunk = max(1024, (1 << 23) // max(n_steps, 1))
    chunk = min(chunk, npix)
    n_chunks = -(-npix // chunk)
    pad = n_chunks * chunk - npix
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t0 = jnp.concatenate([t0, jnp.zeros((pad,), t0.dtype)])
        t1 = jnp.concatenate([t1, jnp.full((pad,), -1.0, t1.dtype)])

    # Python-unrolled chunk loop bounding the (chunk * n_steps) temporary
    # batch. An optimization_barrier threads one chunk's output into the
    # next chunk's input so XLA schedules the chunks sequentially and
    # reuses their temporaries instead of live-ranging all of them at once
    # (which OOMs at 256^3/444 steps).
    outs = []
    for i in range(n_chunks):
        o_i = o[i * chunk:(i + 1) * chunk]
        d_i = d[i * chunk:(i + 1) * chunk]
        t0_i = t0[i * chunk:(i + 1) * chunk]
        t1_i = t1[i * chunk:(i + 1) * chunk]
        if outs:
            o_i, d_i, t0_i, t1_i, _ = jax.lax.optimization_barrier(
                (o_i, d_i, t0_i, t1_i, outs[-1]))
        outs.append(_march_chunk(volume, tf, light_volume,
                                 o_i, d_i, t0_i, t1_i, n_steps, dt, ambient))
    img = outs[0] if n_chunks == 1 else jnp.concatenate(outs)
    return img[:npix]


@partial(jax.jit, static_argnames=("n_steps", "ambient"))
def render_rays_loop(volume: Volume, tf: TransferFunction, light_volume: Array,
                     o: Array, d: Array, n_steps: int,
                     ambient: float = 0.05) -> Array:
    """Sequential-fori_loop marcher (the original formulation): kept as the
    allclose oracle for :func:`render_rays` — identical math; on TPU both
    forms are gather-bound at ~0.11 G lookups/s (honest round-4 numbers:
    dense 28.6 s vs loop 30.8 s per 512^2 x 128^3 frame)."""
    hit, t0, t1 = intersect.ray_box(o, d)
    t0 = jnp.where(hit, t0, 0.0)
    t1 = jnp.where(hit, t1, -1.0)

    dt = (3 ** 0.5) / (n_steps - 1) if n_steps > 1 else 1.0
    sigma_scale = constants.SAMPLING_BASE_INTERVAL_RCP

    npix = o.shape[0]

    def step(i, carry):
        rgb, trans = carry
        t = t0 + (i + 0.5) * dt
        inside = t <= t1
        p = o + t[..., None] * d
        vol = sample_volume_trilinear(volume.data, p)
        color = tf.sample(vol)
        sigma_t = color[:, 3] * sigma_scale
        light = sample_volume_trilinear_vec(light_volume, p)
        emit = color[:, :3] * (light + ambient)
        # Per-step analytic transmittance segment.
        seg_t = jnp.exp(-sigma_t * dt)
        contrib = trans[:, None] * (1.0 - seg_t)[:, None] * emit
        rgb = rgb + jnp.where(inside[:, None], contrib, 0.0)
        trans = jnp.where(inside, trans * seg_t, trans)
        return rgb, trans

    rgb0 = jnp.zeros((npix, 3), jnp.float32)
    trans0 = jnp.ones((npix,), jnp.float32)
    rgb, trans = jax.lax.fori_loop(0, n_steps, step, (rgb0, trans0))
    alpha = 1.0 - trans
    return jnp.concatenate([rgb, alpha[:, None]], axis=-1)


@partial(jax.jit, static_argnames=("n_steps",))
def transmittance_to_point(volume: Volume, tf: TransferFunction, origin: Array,
                           target: Array, n_steps: int = 128) -> Array:
    """Ray-march transmittance between two texture-space points (the analog
    of ``transmittance`` in cl/transmittance.cl:42-62), used by tests and the
    single-scattering oracle."""
    delta = target - origin
    length = jnp.linalg.norm(delta, axis=-1)
    d = delta / jnp.maximum(length, 1e-8)[..., None]
    dt = length / n_steps

    def step(i, acc):
        t = (i + 0.5) * dt
        p = origin + t[..., None] * d
        vol = sample_volume_trilinear(volume.data, p)
        return acc + tf.sample(vol)[..., 3]

    thick = jax.lax.fori_loop(0, n_steps, step, jnp.zeros_like(length))
    return jnp.exp(-thick * dt * constants.SAMPLING_BASE_INTERVAL_RCP)
