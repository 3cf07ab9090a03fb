"""Debug visualization helpers.

Reference parity: ``SamplesToImageProcessor``
(modules/lightcl/processors/samplestoimage — the debug node that renders
the 2D light-sample distribution into an image so sample generators can be
inspected visually).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("width", "height", "normalize"))
def samples_to_image(samples: Array, width: int = 256, height: int = 256,
                     normalize: bool = True) -> Array:
    """Histogram (N, >=2) [u, v, ...] samples into an (H, W) image.

    Weight per sample = its pdf column when present (column 3, the
    reference's float4 sample layout), else 1. ``normalize`` scales the
    image so a uniform distribution is 1 everywhere.
    """
    u = jnp.clip(samples[:, 0], 0.0, 1.0 - 1e-7)
    v = jnp.clip(samples[:, 1], 0.0, 1.0 - 1e-7)
    w = samples[:, 3] if samples.shape[1] > 3 else jnp.ones(samples.shape[0])
    ix = (u * width).astype(jnp.int32)
    iy = (v * height).astype(jnp.int32)
    flat = jnp.zeros((height * width,), jnp.float32)
    flat = flat.at[iy * width + ix].add(w)
    img = flat.reshape(height, width)
    if normalize:
        img = img * (width * height / jnp.maximum(jnp.sum(img), 1e-12))
    return img
