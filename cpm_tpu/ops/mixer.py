"""Buffer/volume interpolation for time-varying playback.

Reference parity:
- BufferMixerCL generic typed lerp (modules/uniformgridcl/buffermixercl.cpp:47-85,
  kernel cl/buffermixer.cl:37-48)
- VolumeSequencePlayer's GLSL volume mix
  (glsl/volume_mix.frag:43-47: mix(vol_t, vol_{t+1}, frac))

On TPU both are the same fused jnp lerp; the runtime-codegen'd MIX_T kernel
specialization is simply dtype polymorphism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@jax.jit
def mix(a: Array, b: Array, x: Array) -> Array:
    """a*(1-x) + b*x elementwise (any dtype/shape)."""
    xf = jnp.asarray(x, jnp.float32)
    return (a.astype(jnp.float32) * (1.0 - xf)
            + b.astype(jnp.float32) * xf).astype(a.dtype)


@jax.jit
def sequence_sample(sequence: Array, time: Array) -> Array:
    """Interpolated element at fractional ``time`` in [0, T-1] from a
    (T, ...) sequence (VolumeSequencePlayer::process,
    volumesequenceplayer.cpp:94-143). Cyclic indexing like the player's
    wrap-around timer."""
    t = sequence.shape[0]
    tf_ = jnp.asarray(time, jnp.float32)
    i0 = jnp.floor(tf_).astype(jnp.int32) % t
    i1 = (i0 + 1) % t
    frac = tf_ - jnp.floor(tf_)
    return mix(sequence[i0], sequence[i1], frac)
