"""Binned (sort -> tile -> MXU) splat vs the dense product splat.

The binned backend must reproduce ``splat_product_xla`` (the oracle-matched
production formulation, tests/test_splat.py) to float tolerance on any
photon distribution — uniform, heavily clustered (multi-block skew),
boundary-hugging, and sentinel-laden — and be bit-deterministic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core import constants
from cpm_tpu.core.types import PhotonData
from cpm_tpu.ops import splat, splat_binned
from cpm_tpu.pallas.splat_mxu import PRODUCT_KERNEL_MATCH

R = 0.0153866  # default radius_rel -> 65^3 light volume, footprint 4


def _product_ref(pos, pw, radius_rel, scale, out_dim):
    """The existing dense product splat with the same scale convention."""
    pw_scaled = pw * (scale * np.float32(PRODUCT_KERNEL_MATCH))
    pw_scaled = jnp.where(pos[:, 0:1] < 1e30, pw_scaled, 0.0)
    return splat.splat_product_xla(pos, pw_scaled, jnp.float32(radius_rel),
                                   out_dim)


def _rand(n, key, lo=0.0, hi=1.0):
    ks = jax.random.split(key, 2)
    pos = jax.random.uniform(ks[0], (n, 3), minval=lo, maxval=hi)
    pw = jax.random.uniform(ks[1], (n, 3))
    return pos.astype(jnp.float32), pw.astype(jnp.float32)


class TestBinnedSplat:
    @pytest.mark.parametrize("dim", [65, 33])
    def test_uniform_matches_product(self, dim):
        pos, pw = _rand(4096, jax.random.PRNGKey(0))
        out_dim = (dim, dim, dim)
        got = splat_binned.splat_binned_flat(pos, pw, R, 2.5, out_dim)
        ref = _product_ref(pos, pw, R, 2.5, out_dim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_clustered_skew_multi_block(self):
        # Everything inside one tile -> worst-case occupancy skew; tiny
        # k_cap forces many (tile, base) rounds per tile.
        pos, pw = _rand(3000, jax.random.PRNGKey(1), lo=0.40, hi=0.45)
        out_dim = (65, 65, 65)
        got = splat_binned.splat_binned_flat(pos, pw, R, 1.0, out_dim,
                                            k_cap=128, a_chunk=8)
        ref = _product_ref(pos, pw, R, 1.0, out_dim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_boundary_photons_and_sentinels(self):
        pos, pw = _rand(2048, jax.random.PRNGKey(2))
        # Push a band of photons onto the grid faces and invalidate others.
        pos = pos.at[:256, 0].set(0.0005)
        pos = pos.at[256:512, 2].set(0.9995)
        pos = pos.at[512:768].set(jnp.float32(constants.FLT_MAX))
        out_dim = (65, 65, 65)
        got = splat_binned.splat_binned_flat(pos, pw, R, 1.0, out_dim)
        ref = _product_ref(pos, pw, R, 1.0, out_dim)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_all_invalid_is_zero(self):
        pos = jnp.full((512, 3), constants.FLT_MAX)
        pw = jnp.ones((512, 3))
        out = splat_binned.splat_binned_flat(pos, pw, R, 1.0, (65, 65, 65))
        assert float(jnp.abs(out).max()) == 0.0

    def test_deterministic(self):
        pos, pw = _rand(4096, jax.random.PRNGKey(3))
        a = splat_binned.splat_binned_flat(pos, pw, R, 1.0, (65, 65, 65))
        b = splat_binned.splat_binned_flat(pos, pw, R, 1.0, (65, 65, 65))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_photondata_entry_matches_splat_all(self):
        key = jax.random.PRNGKey(4)
        i, n = 2, 2048
        pos = jax.random.uniform(key, (i, n, 3)).astype(jnp.float32)
        pw = jax.random.uniform(jax.random.fold_in(key, 1),
                                (i, n, 3)).astype(jnp.float32)
        ph = PhotonData.create(n, i).replace(
            positions=pos, powers=pw, radius_rel=jnp.float32(R))
        got = splat_binned.splat_all_binned(ph, (65, 65, 65), footprint=4)
        ref = splat.splat_all(ph, (65, 65, 65), footprint=4, method="matmul")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestScalableCorrelatedStep:
    def test_matches_jitted_correlated_step(self):
        """Host-orchestrated binned correlated update == the fully jitted
        one (both on the product kernel) to float tolerance."""
        from cpm_tpu.core.camera import Camera
        from cpm_tpu.core.config import (PipelineConfig, RecomputeConfig,
                                         RenderConfig, SplatConfig,
                                         TracerConfig)
        from cpm_tpu.core.lights import Light
        from cpm_tpu.core.scene import Scene
        from cpm_tpu.core.types import TransferFunction, Volume
        from cpm_tpu.io import synthetic
        from cpm_tpu.pipeline import step as pstep

        vol = Volume.from_data(synthetic.sphere_in_box(32))
        tf = TransferFunction.from_points(*synthetic.default_tf_points())
        tfs = TransferFunction.from_points(
            *synthetic.default_scattering_points())
        scene = Scene.create(vol, tf, tfs,
                             [Light.directional((0.0, -1.0, 0.3))],
                             Camera.create())
        cfg = PipelineConfig(
            photons_x=32, photons_y=32,
            tracer=TracerConfig(max_interactions=2, max_steps=3000),
            splat=SplatConfig(method="matmul"),
            render=RenderConfig(width=16, height=16),
            recompute=RecomputeConfig(max_photons_fraction=0.1))
        st = pstep.full_trace_step(scene, pstep.init_state(scene, cfg), cfg)
        ig = pstep.build_importance_grid(scene, cfg)
        budget = pstep.recompute_budget(cfg, st.photons.n)

        ref = pstep.correlated_step(scene, st, cfg, ig, budget)
        got = pstep.correlated_step_scalable(scene, st, cfg, ig, budget)
        np.testing.assert_allclose(np.asarray(got.light_volume),
                                   np.asarray(ref.light_volume),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.photons.positions),
                                      np.asarray(ref.photons.positions))
        np.testing.assert_array_equal(np.asarray(got.retraced),
                                      np.asarray(ref.retraced))
        assert int(got.n_remaining) == int(ref.n_remaining)
