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


def ray_triangles(origins: Array, directions: Array, v0: Array, v1: Array,
                  v2: Array, eps: float = 1e-7):
    """Batched Moller-Trumbore: all (ray, triangle) intersection params.

    Reference: ``rayMeshIntersection`` looping raytriangleintersection over
    the index buffer
    (modules/lightcl/cl/intersection/lightsamplemeshintersection.cl:36-58
    via Inviwo's raymeshintersection.cl). TPU-first: the (N rays, F tris)
    product is evaluated densely — one broadcasted batch instead of a
    per-thread loop; scene bounding meshes are tiny (F ~ 10-100).

    Args:
      origins: (N, 3); directions: (N, 3); v0/v1/v2: (F, 3) triangle
        vertices.

    Returns:
      (hit, t): (N, F) bool/float — ``t`` is valid only where ``hit``.
    """
    e1 = v1 - v0  # (F, 3)
    e2 = v2 - v0
    d = directions[:, None, :]  # (N, 1, 3)
    p = jnp.cross(d, e2[None, :, :])  # (N, F, 3)
    det = jnp.sum(p * e1[None, :, :], axis=-1)  # (N, F)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    s = origins[:, None, :] - v0[None, :, :]  # (N, F, 3)
    u = jnp.sum(s * p, axis=-1) * inv_det
    q = jnp.cross(s, e1[None, :, :])
    v = jnp.sum(q * d, axis=-1) * inv_det
    t = jnp.sum(q * e2[None, :, :], axis=-1) * inv_det
    hit = ((jnp.abs(det) > eps) & (u >= 0.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t >= 0.0))
    return hit, t


def light_sample_mesh_intersection(origins: Array, directions: Array,
                                   vertices: Array, faces: Array):
    """[tStart, tEnd] spans of light-sample rays against a closed triangle
    mesh: the entry/exit pair is the min/max hit parameter over all faces
    (lightsamplemeshintersection.cl:36-58 semantics, miss -> (0, -1)).

    ``vertices`` is (V, 3) texture-space, ``faces`` (F, 3) int indices.
    A single boundary graze (one hit) yields the degenerate span (t, t).
    """
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    hit, t = ray_triangles(origins, directions, v0, v1, v2)
    big = jnp.float32(3.4e38)
    tn = jnp.min(jnp.where(hit, t, big), axis=-1)
    tf = jnp.max(jnp.where(hit, t, -big), axis=-1)
    any_hit = jnp.any(hit, axis=-1)
    # An odd forward-hit count means the origin is inside the closed mesh:
    # the span starts at the origin (t0 = 0), matching the reference's
    # t0-initialized-to-0 walk (lightsamplemeshintersection.cl:52).
    inside = (jnp.sum(hit.astype(jnp.int32), axis=-1) % 2) == 1
    tn = jnp.where(inside, 0.0, tn)
    tn = jnp.where(any_hit, tn, 0.0)
    tf = jnp.where(any_hit, tf, -1.0)
    return jnp.stack([tn, tf], axis=-1)


def box_mesh(box_min=(0.0, 0.0, 0.0), box_max=(1.0, 1.0, 1.0)):
    """The unit-cube proxy geometry as a 12-triangle mesh (the shipped
    workspace's CubeProxyGeometry): (vertices (8, 3), faces (12, 3))."""
    import numpy as np
    lo, hi = np.asarray(box_min, np.float32), np.asarray(box_max, np.float32)
    corners = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                        [lo[0], hi[1], lo[2]], [hi[0], hi[1], lo[2]],
                        [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                        [lo[0], hi[1], hi[2]], [hi[0], hi[1], hi[2]]],
                       np.float32)
    faces = np.array([
        [0, 1, 3], [0, 3, 2],  # z = lo
        [4, 7, 5], [4, 6, 7],  # z = hi
        [0, 5, 1], [0, 4, 5],  # y = lo
        [2, 3, 7], [2, 7, 6],  # y = hi
        [0, 2, 6], [0, 6, 4],  # x = lo
        [1, 5, 7], [1, 7, 3],  # x = hi
    ], np.int32)
    return jnp.asarray(corners), jnp.asarray(faces)
