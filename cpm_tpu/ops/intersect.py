"""Ray/geometry intersection ops (batched, branch-free).

Reference parity: Inviwo's ``intersection/rayboxintersection.cl`` and
``modules/lightcl/cl/intersection/lightsamplemeshintersection.cl:36-58``
(the latter intersects light rays against the scene's bounding mesh; for the
axis-aligned proxy cube used in the shipped workspace this is a ray-AABB
test, which is what we implement — misses are encoded (0, -1)).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def ray_box(origin: Array, direction: Array, box_min=0.0, box_max=1.0,
            t0: float | Array = 0.0, t1: float | Array = 3.4e38):
    """Slab-method ray/AABB intersection.

    Args:
      origin: (..., 3) ray origins.
      direction: (..., 3) ray directions (need not be normalized).
      box_min/box_max: scalars or (3,) box corners.
      t0/t1: initial parametric clip range.

    Returns:
      (hit, tNear, tFar): boolean mask and the clipped parametric range.
    """
    box_min = jnp.broadcast_to(jnp.asarray(box_min, jnp.float32), origin.shape)
    box_max = jnp.broadcast_to(jnp.asarray(box_max, jnp.float32), origin.shape)
    # Avoid division by zero: huge but finite reciprocals keep the slab logic
    # correct for axis-parallel rays.
    inv_d = jnp.where(jnp.abs(direction) > 1e-30, 1.0 / direction,
                      jnp.sign(direction) * 1e30 + (direction == 0) * 1e30)
    ta = (box_min - origin) * inv_d
    tb = (box_max - origin) * inv_d
    t_near = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t_far = jnp.min(jnp.maximum(ta, tb), axis=-1)
    t_near = jnp.maximum(t_near, jnp.asarray(t0, jnp.float32))
    t_far = jnp.minimum(t_far, jnp.asarray(t1, jnp.float32))
    hit = t_near <= t_far
    return hit, t_near, t_far


def light_sample_box_intersection(origins: Array, directions: Array,
                                  box_min=0.0, box_max=1.0):
    """[tStart, tEnd] spans for light-sample rays against the volume box.

    Misses become (0, -1), the sentinel of
    lightsamplemeshintersectioncl.cpp:51-101."""
    hit, tn, tf = ray_box(origins, directions, box_min, box_max)
    tn = jnp.where(hit, tn, 0.0)
    tf = jnp.where(hit, tf, -1.0)
    return jnp.stack([tn, tf], axis=-1)
