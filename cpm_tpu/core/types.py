"""Core pytree data structures of the TPU-native photon mapper.

The reference implementation stores these as Inviwo buffers/volumes with
multi-representation (RAM/GL/CL); here every container is a frozen JAX pytree
of device arrays so the whole pipeline is one jit-compiled dataflow graph.

Reference parity map:

- :class:`Volume`           <- inviwo Volume + VolumeParameters
  (texture-space sampling, modules/progressivephotonmapping/cl/photontracer.cl)
- :class:`TransferFunction` <- tfData/tfScattering 2D textures + TF point list
  (modules/importancesamplingcl/.../minmaxuniformgrid3dimportanceclprocessor.cpp:304-362)
- :class:`PhotonData`       <- photon SoA float8 buffer + progressive radius
  (modules/progressivephotonmapping/photondata.h:65-156)
- :class:`LightSamples`     <- packed light samples + intersection spans
  (modules/lightcl/lightsample.h:88-115)
- :class:`UniformGrid3D`    <- modules/uniformgridcl/uniformgrid3d.h:114-136
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cpm_tpu.core import constants

Array = jax.Array


@struct.dataclass
class Volume:
    """A scalar volume with a texture-space ([0,1]^3) to world transform.

    ``data`` is normalized to [0,1] (the reference samples through
    ``getNormalizedVoxel``), stored [z, y, x] with x fastest.
    ``basis`` columns are the world-space edge vectors of the volume box and
    ``offset`` its world-space origin (texture -> world:  w = basis @ t + offset).
    """

    data: Array  # (D, H, W) float32 in [0, 1]
    basis: Array  # (3, 3) float32
    offset: Array  # (3,) float32

    @property
    def shape_zyx(self):
        return self.data.shape

    @property
    def dim_xyz(self) -> Array:
        d, h, w = self.data.shape
        return jnp.array([w, h, d], jnp.float32)

    def scene_radius(self) -> Array:
        """0.5 * |(|b0|, |b1|, |b2|)| — reference
        progressivephotontracercl.cpp:659-672 (getSceneRadius)."""
        ext = jnp.linalg.norm(self.basis, axis=0)
        return 0.5 * jnp.linalg.norm(ext)

    @classmethod
    def from_data(cls, data, basis=None, offset=None) -> "Volume":
        data = jnp.asarray(data, jnp.float32)
        if basis is None:
            basis = jnp.eye(3, dtype=jnp.float32) * 2.0
        if offset is None:
            offset = jnp.array([-1.0, -1.0, -1.0], jnp.float32)
        return cls(data=data, basis=jnp.asarray(basis, jnp.float32),
                   offset=jnp.asarray(offset, jnp.float32))


@struct.dataclass
class TransferFunction:
    """Piecewise-linear RGBA transfer function.

    Both the point-list form (for importance classification, mirroring the TF
    point arrays uploaded in minmaxuniformgrid3dimportanceclprocessor.cpp:304-362)
    and a baked LUT (the reference's ``tfData`` 2D texture) are stored.
    ``lut[..., 3]`` is opacity; extinction = opacity * SAMPLING_BASE_INTERVAL_RCP.
    """

    positions: Array  # (P,) float32 ascending in [0, 1]
    colors: Array  # (P, 4) float32 RGBA
    lut: Array  # (K, 4) float32, baked

    @classmethod
    def from_points(cls, positions, colors, lut_size: int = 256) -> "TransferFunction":
        positions = jnp.asarray(positions, jnp.float32)
        colors = jnp.asarray(colors, jnp.float32)
        x = (jnp.arange(lut_size, dtype=jnp.float32) + 0.5) / lut_size
        lut = jax.vmap(
            lambda xi: jax.vmap(
                lambda c: jnp.interp(xi, positions, c)
            )(colors.T)
        )(x)
        return cls(positions=positions, colors=colors, lut=lut)

    def sample(self, x: Array) -> Array:
        """Exact piecewise-linear TF evaluation from the point list.

        The reference samples a baked 2D texture
        (``read_imagef(tfData, smpNormClampEdgeLinear, (x, 0.5))``,
        photontracer.cl:171-173) because GPUs have texture units; the texture
        is itself a discretization of this point list. On TPU a table lookup
        is a gather (~0.11 G lookups/s honest, the round-3 tracer-regression
        culprit) while P-1 fused segment lerps are pure dense VPU work — so
        the exact point-list evaluation is both faster AND more accurate
        here. Outside [positions[0], positions[-1]] the edge color is
        clamped, matching CLAMP_TO_EDGE. :meth:`sample_lut` keeps the baked
        form for tests of the reference's texture semantics.
        """
        p, c = self.positions, self.colors
        n_pts = p.shape[0]
        acc = jnp.broadcast_to(c[0], x.shape + (c.shape[-1],))
        for s in range(n_pts - 1):
            t = (x - p[s]) / jnp.maximum(p[s + 1] - p[s], 1e-12)
            t = jnp.clip(t, 0.0, 1.0)
            seg = c[s] + (c[s + 1] - c[s]) * t[..., None]
            acc = jnp.where((x >= p[s])[..., None], seg, acc)
        return acc

    def sample_opacity(self, x: Array) -> Array:
        """Opacity-channel-only piecewise evaluation.

        The photon tracer consumes ONLY ``color.w`` (acceptance test,
        power scaling, albedo — photontracer.cl:171-176 reads the .w
        lanes); evaluating one channel instead of four cut the trace's TF
        cost 23 ms -> ~6 ms at 65k/128^3 (round-4 knockout profile)."""
        p, c = self.positions, self.colors[:, 3]
        n_pts = p.shape[0]
        acc = jnp.broadcast_to(c[0], x.shape)
        for s in range(n_pts - 1):
            t = (x - p[s]) / jnp.maximum(p[s + 1] - p[s], 1e-12)
            t = jnp.clip(t, 0.0, 1.0)
            seg = c[s] + (c[s + 1] - c[s]) * t
            acc = jnp.where(x >= p[s], seg, acc)
        return acc

    def sample_lut(self, x: Array) -> Array:
        """Baked-LUT lookup with linear interpolation and edge clamping (the
        reference's texture semantics exactly, including its K-bin
        discretization). One flat minor-dim lane gather per (channel,
        corner); not for hot paths."""
        k, c = self.lut.shape
        xf = jnp.clip(x * k - 0.5, 0.0, k - 1.0)
        i0 = jnp.floor(xf).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, k - 1)
        w = xf - i0.astype(jnp.float32)
        idx0 = i0.reshape(1, -1)
        idx1 = i1.reshape(1, -1)
        chans = []
        for ci in range(c):
            tab = self.lut[:, ci][None, :]  # (1, K)
            v0 = jnp.take_along_axis(tab, idx0, axis=-1).reshape(x.shape)
            v1 = jnp.take_along_axis(tab, idx1, axis=-1).reshape(x.shape)
            chans.append(v0 * (1.0 - w) + v1 * w)
        return jnp.stack(chans, axis=-1)


@struct.dataclass
class LightSamples:
    """Per-light-sample ray bundle: origin, direction, power, [tStart, tEnd].

    Reference: StoredLightSample float8 + StoredIntersectionPoint float2
    (modules/lightcl/cl/datastructures/lightsample.cl:68-130). A miss is
    encoded as tspan = (0, -1), matching lightsamplemeshintersectioncl.cpp.
    """

    origins: Array  # (N, 3) texture space
    directions: Array  # (N, 3) normalized
    powers: Array  # (N, 3)
    tspan: Array  # (N, 2) [tStart, tEnd]
    iteration: Array  # () int32, advance-detection counter

    @property
    def n(self) -> int:
        return self.origins.shape[0]


@struct.dataclass
class PhotonData:
    """SoA photon storage, interaction-major like the reference layout
    ``photonId = interaction * totalPhotons + threadId``
    (cl/photontracer.cl:166): slot [i, t] holds the photon deposited by light
    sample ``t`` at its ``i``-th interaction.

    Unused slots have position == FLT_MAX sentinels
    (cl/photontracer.cl:199-209). ``power_exit_flag`` semantics follow the
    reference: after an absorption event the *remaining* light-sample power is
    set to FLT_MAX so the recomputation detector can distinguish absorbed
    paths from paths that exited the volume (cl/photontracer.cl:185-193).
    """

    positions: Array  # (I, N, 3) texture space; FLT_MAX sentinel when unused
    powers: Array  # (I, N, 3)
    directions: Array  # (I, N, 2) encoded (theta, phi)
    exit_power: Array  # (N,) power.x after trace; FLT_MAX if absorbed
    exit_direction: Array  # (N, 2) encoded direction after the last event
    radius_rel: Array  # () float32, radius relative to scene radius
    scene_radius: Array  # () float32
    iteration: Array  # () int32

    @property
    def max_interactions(self) -> int:
        return self.positions.shape[0]

    @property
    def n(self) -> int:
        return self.positions.shape[1]

    @property
    def world_radius(self) -> Array:
        return self.radius_rel * self.scene_radius

    @classmethod
    def create(cls, n: int, max_interactions: int = 1,
               radius_rel: float = constants.DEFAULT_RADIUS_REL,
               scene_radius: float = constants.DEFAULT_SCENE_RADIUS) -> "PhotonData":
        big = jnp.float32(constants.FLT_MAX)
        return cls(
            positions=jnp.full((max_interactions, n, 3), big),
            powers=jnp.zeros((max_interactions, n, 3), jnp.float32),
            directions=jnp.zeros((max_interactions, n, 2), jnp.float32),
            exit_power=jnp.full((n,), big),
            exit_direction=jnp.zeros((n, 2), jnp.float32),
            radius_rel=jnp.float32(radius_rel),
            scene_radius=jnp.float32(scene_radius),
            iteration=jnp.int32(0),
        )


def progressive_sphere_radius(radius: Array, iteration: Array, alpha: float) -> Array:
    """Knaus-Zwicker progressive radius: r_{i+1} = r_i ((i+a)/(i+1))^(1/3).

    Reference: photondata.cpp:73-80."""
    it = jnp.asarray(iteration, jnp.float32)
    return radius * ((it + alpha) / (1.0 + it)) ** (1.0 / 3.0)


def sphere_volume(radius: Array) -> Array:
    return (radius ** 3) * (np.pi * 4.0 / 3.0)


def relative_irradiance_scale(n_photons: Array, radius_rel: Array) -> Array:
    """Splat scale = (1/pi) / (photonVolume * nPhotons), the normalization
    applied before splatting (photontolightvolumeprocessorcl.cpp:388-392)."""
    return jnp.float32(constants.SCALE_LIGHT_POWER_DIRECTIONAL) / (
        sphere_volume(radius_rel) * jnp.asarray(n_photons, jnp.float32))


def encode_direction(d: Array) -> Array:
    """Direction -> (theta, phi) spherical packing (photondata.cpp:101-118)."""
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    return jnp.stack([theta, phi], axis=-1)


def decode_direction(angles: Array) -> Array:
    theta, phi = angles[..., 0], angles[..., 1]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


@struct.dataclass
class UniformGrid3D:
    """Uniform spatial grid over a volume's texture space.

    ``data`` is [z, y, x(, c)]; ``cell_dim`` is the cell size in *voxels* of
    the underlying volume (reference: uniformgrid3d.h:114-136). Grids of
    min/max pairs use c=2 (the reference's u16vec2, kept as float32 here),
    importance grids have no channel axis.
    """

    data: Array  # (gz, gy, gx) or (gz, gy, gx, C)
    cell_dim: Array  # (3,) float32, cell size in voxels (x, y, z)
    volume_dim: Array  # (3,) float32, voxels of source volume (x, y, z)

    @property
    def grid_dim_xyz(self):
        gz, gy, gx = self.data.shape[:3]
        return (gx, gy, gz)


@struct.dataclass
class LightVolume:
    """The irradiance grid the photons are splatted into.

    Reference: the float4 light volume written by
    cl/photonstolightvolume.cl:139-202, consumed by the lighting raycaster.
    """

    data: Array  # (D, H, W, 3) float32 RGB irradiance
    basis: Array  # (3, 3)
    offset: Array  # (3,)

    @classmethod
    def zeros(cls, dim: int | tuple, basis=None, offset=None) -> "LightVolume":
        if isinstance(dim, int):
            dim = (dim, dim, dim)
        if basis is None:
            basis = jnp.eye(3, dtype=jnp.float32) * 2.0
        if offset is None:
            offset = jnp.array([-1.0, -1.0, -1.0], jnp.float32)
        return cls(data=jnp.zeros((*dim, 3), jnp.float32),
                   basis=jnp.asarray(basis, jnp.float32),
                   offset=jnp.asarray(offset, jnp.float32))
