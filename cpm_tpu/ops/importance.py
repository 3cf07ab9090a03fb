"""Importance-grid construction: min/max grid + transfer function ->
per-cell visual importance, including the time-varying and incremental
TF-difference modes.

Reference parity:
- per-cell classification  modules/importancesamplingcl/cl/
  minmaxuniformgrid3dimportance.cl:186-330 (importanceForRangeTF,
  classify[TimeVarying]MinMaxUniformGrid3DImportanceKernel)
- Lab metric + weights     tfPointsImportance (cl:171-184), weights
  normalized to sum 1 and Lab scaled by 1/|(100,500,400)| on host
  (minmaxuniformgrid3dimportanceclprocessor.cpp:227-248, :299-302)
- incremental TF diff      CPU merge-walk of current/previous TF point
  lists emitting |dRGBA| points (processor cpp:364-501), classified with
  the INCREMENTAL_TF_IMPORTANCE variant (cl:164-169)

TPU-first: the per-cell while-loops over TF segments become masked
reductions over the (small, padded) TF point list, vmapped across all grid
cells — dense (cells x points) VPU work instead of divergent loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

LAB_NORMALIZATION = 1.0 / np.linalg.norm([100.0, 500.0, 400.0])


@dataclass(frozen=True)
class ImportanceWeights:
    """Raw UI weights; ``normalized()`` applies the host-side scaling."""

    color: float = 1.0
    color_diff: float = 1.0
    opacity_diff: float = 1.0
    opacity: float = 1.0

    def normalized(self):
        s = self.color + self.color_diff + self.opacity_diff + self.opacity
        if s <= 0.0:
            s = 1.0
        return (self.color * LAB_NORMALIZATION / s,
                self.color_diff * LAB_NORMALIZATION / s,
                self.opacity_diff / s,
                self.opacity / s)


def rgb2lab(rgb: Array) -> Array:
    """sRGB (linear? the reference treats TF colors as sRGB) -> CIELAB D65.

    Matches Inviwo's colorconversion.cl rgb2lab: sRGB gamma expansion,
    XYZ (D65), then Lab f() with the 0.008856 cube-root split.
    """
    c = jnp.asarray(rgb)
    c = jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)
    m = jnp.array([[0.4124, 0.3576, 0.1805],
                   [0.2126, 0.7152, 0.0722],
                   [0.0193, 0.1192, 0.9505]], jnp.float32)
    xyz = c @ m.T
    white = jnp.array([0.95047, 1.0, 1.08883], jnp.float32)
    r = xyz / white
    eps = 0.008856
    kappa = 903.3
    f = jnp.where(r > eps, jnp.cbrt(r), (kappa * r + 16.0) / 116.0)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def tf_points_importance(color: Array, next_color: Array, weights) -> Array:
    """Weighted Lab-magnitude/diff/opacity metric
    (minmaxuniformgrid3dimportance.cl:171-184)."""
    w_color, w_color_diff, w_opacity_diff, w_opacity = weights
    any_opaque = (color[..., 3] > 0.0) | (next_color[..., 3] > 0.0)
    lab = rgb2lab(color[..., :3])
    next_lab = rgb2lab(next_color[..., :3])
    color_diff = jnp.linalg.norm(next_lab - lab, axis=-1)
    opacity_diff = jnp.abs(next_color[..., 3] - color[..., 3])
    imp = (w_color * jnp.maximum(jnp.linalg.norm(next_lab, axis=-1),
                                 jnp.linalg.norm(lab, axis=-1))
           + w_color_diff * color_diff
           + w_opacity_diff * opacity_diff
           + w_opacity * jnp.maximum(color[..., 3], next_color[..., 3]))
    return jnp.where(any_opaque, imp, 0.0)


def tf_points_importance_incremental(next_color: Array) -> Array:
    """INCREMENTAL_TF_IMPORTANCE variant: sum of |delta| components
    (minmaxuniformgrid3dimportance.cl:164-169)."""
    return jnp.sum(next_color, axis=-1)


def _interp_color(positions: Array, colors: Array, x: Array) -> Array:
    """Piecewise-linear TF evaluation with edge clamping; (..., 4)."""
    return jax.vmap(lambda ch: jnp.interp(x, positions, ch), out_axes=-1)(
        colors.T)


def color_envelope(positions: Array, colors: Array, lo: Array, hi: Array):
    """Min/max RGBA envelope of the TF over data range [lo, hi].

    The vectorized equivalent of the reference's importanceForRangeTF
    segment walk (cl:186-249): envelope of color(lo), color(hi) and every
    control point strictly inside (lo, hi).
    """
    c_lo = _interp_color(positions, colors, lo)
    c_hi = _interp_color(positions, colors, hi)
    interior = ((positions[None, :] > lo[:, None])
                & (positions[None, :] < hi[:, None]))  # (cells, P)
    big = jnp.float32(3.4e38)
    cexp = jnp.broadcast_to(colors[None, :, :],
                            (lo.shape[0],) + colors.shape)
    cmin_int = jnp.min(jnp.where(interior[..., None], cexp, big), axis=1)
    cmax_int = jnp.max(jnp.where(interior[..., None], cexp, -big), axis=1)
    cmin = jnp.minimum(jnp.minimum(c_lo, c_hi), cmin_int)
    cmax = jnp.maximum(jnp.maximum(c_lo, c_hi), cmax_int)
    return cmin, cmax


@partial(jax.jit, static_argnames=("weights", "incremental"))
def classify_importance(minmax: Array, positions: Array, colors: Array,
                        weights: tuple, incremental: bool = False) -> Array:
    """(gz, gy, gx, 2) min/max grid -> (gz, gy, gx) importance.

    classifyMinMaxUniformGrid3DImportanceKernel (cl:269-289)."""
    shape = minmax.shape[:-1]
    flat = minmax.reshape(-1, 2)
    cmin, cmax = color_envelope(positions, colors, flat[:, 0], flat[:, 1])
    if incremental:
        imp = tf_points_importance_incremental(cmax)
    else:
        imp = tf_points_importance(cmin, cmax, weights)
    return imp.reshape(shape)


@partial(jax.jit, static_argnames=("weights",))
def classify_time_varying_importance(minmax: Array, prev_minmax: Array,
                                     volume_diff: Array, positions: Array,
                                     colors: Array, weights: tuple) -> Array:
    """importance = volumeDiff * TF-importance over the min/max envelope of
    both time steps (classifyTimeVaryingMinMax...Kernel, cl:291-330)."""
    env = jnp.stack([jnp.minimum(minmax[..., 0], prev_minmax[..., 0]),
                     jnp.maximum(minmax[..., 1], prev_minmax[..., 1])], -1)
    imp = classify_importance(env, positions, colors, weights)
    return volume_diff * imp


def tf_difference_points(positions_a, colors_a, positions_b, colors_b,
                         eps: float = 1e-4):
    """Merge-walk two TF point lists and emit |delta RGBA| points — the
    incremental TF-difference mode (host-side numpy, mirroring
    minmaxuniformgrid3dimportanceclprocessor.cpp:364-501).

    Returns (positions, diff_colors) covering the union of control points;
    segments where the TFs agree within ``eps`` produce zero points.
    """
    pa = np.asarray(positions_a, np.float64)
    pb = np.asarray(positions_b, np.float64)
    ca = np.asarray(colors_a, np.float64)
    cb = np.asarray(colors_b, np.float64)
    union = np.unique(np.concatenate([pa, pb]))

    def interp(p, c, x):
        return np.stack([np.interp(x, p, c[:, k]) for k in range(4)], -1)

    va = interp(pa, ca, union)
    vb = interp(pb, cb, union)
    diff = np.abs(va - vb)
    diff[diff < eps] = 0.0
    return union.astype(np.float32), diff.astype(np.float32)
