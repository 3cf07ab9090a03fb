"""Differentiability v1: detached-trace gradients with finite-difference
validation (BASELINE.md gradient target; SURVEY.md §7 step 8).

Pipeline under test: stored photon paths (detached) -> differentiable
power replay (ops/replay.py) -> splat -> shear-warp render -> scalar image
loss. Validated parameter groups: (a) TF colors (absorption/emission),
(b) scattering TF colors (albedo), (c) density grid, (d) light radiance.

Documented limitation (detached sampling): gradients do NOT include
trajectory movement — the positions where photons interact are treated as
fixed samples. Light-radiance gradients are nevertheless EXACT (paths are
radiance-independent); for the other groups the replay covers every
power-chain and render term."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.core.camera import Camera
from cpm_tpu.core.config import RenderConfig, TracerConfig
from cpm_tpu.core.lights import Light
from cpm_tpu.core.types import TransferFunction, Volume
from cpm_tpu.io import synthetic
from cpm_tpu.ops import emit, replay, sampling, splat, sweep_render, tracer

DIM = 16
LV_DIM = 8


@pytest.fixture(scope="module")
def setup():
    volume = Volume.from_data(synthetic.smoke_cloud(DIM, seed=5))
    tf_pos = jnp.array([0.0, 0.25, 0.6, 1.0])
    tf_cols = jnp.array([[0.1, 0.2, 0.3, 0.05], [0.4, 0.5, 0.3, 0.3],
                         [0.9, 0.7, 0.5, 0.6], [1.0, 1.0, 1.0, 0.9]])
    sc_pos = jnp.array([0.0, 1.0])
    sc_cols = jnp.array([[1.0, 1.0, 1.0, 0.7], [1.0, 1.0, 1.0, 0.9]])
    tf = TransferFunction.from_points(tf_pos, tf_cols)
    tfs = TransferFunction.from_points(sc_pos, sc_cols)
    light = Light.directional((0.2, -1.0, 0.3))
    samples = sampling.stratified_grid_2d(16, 16)
    ls = emit.emit(light, samples)
    cfg = TracerConfig(max_interactions=3, max_steps=1500,
                       use_compaction=False)
    photons = tracer.trace_photons(volume, tf, tfs, ls,
                                   jax.random.PRNGKey(3), cfg)
    return volume, (tf_pos, tf_cols), (sc_pos, sc_cols), ls, photons


class TestReplayForward:
    def test_replay_matches_traced_powers(self, setup):
        """The differentiable replay must reproduce the tracer's stored
        powers exactly (same recurrence, same clamps)."""
        volume, (tp, tc), (sp, sc), ls, photons = setup
        tf = TransferFunction.from_points(tp, tc)
        tfs = TransferFunction.from_points(sp, sc)
        rp = replay.replay_powers(volume, tf, tfs, photons, ls)
        dep = np.asarray(photons.positions[..., 0] < 1e30)
        a, b = np.asarray(rp), np.asarray(photons.powers)
        assert dep.sum() > 50  # the scene actually deposits photons
        np.testing.assert_allclose(a[dep], b[dep], rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(a[~dep], 0.0)


def _loss(vol_data, tf_cols, sc_cols, light_scale, setup_vals):
    volume, (tp, _), (sp, _), ls, photons = setup_vals
    vol = volume.replace(data=vol_data)
    tf = TransferFunction.from_points(tp, tf_cols)
    tfs = TransferFunction.from_points(sp, sc_cols)
    ls2 = ls.replace(powers=ls.powers * light_scale[None, :])
    ph = replay.replay_photons(vol, tf, tfs, photons, ls2)
    lv = splat.splat_all(ph, (LV_DIM,) * 3, footprint=4)
    cam = Camera.create(eye=(0.45, 0.6, -1.5))
    rcfg = RenderConfig(width=12, height=12, sampling_rate=1.5)
    img = sweep_render.sweep_render(vol, tf, lv, cam, rcfg)
    return jnp.sum(img[..., :3] * jnp.linspace(0.5, 1.5, 3)[None, None, :])


class TestGradientsFiniteDifference:
    @pytest.fixture(scope="class")
    def grads(self, setup):
        volume, (tp, tc), (sp, sc), ls, photons = setup
        args = (volume.data, tc, sc, jnp.ones(3, jnp.float32))
        lfn = lambda *a: _loss(*a, setup_vals=setup)
        val = lfn(*args)
        g = jax.grad(lfn, argnums=(0, 1, 2, 3))(*args)
        return args, lfn, float(val), g

    def _directional_check(self, args, lfn, g, argnum, v, eps, rtol):
        v = v / np.linalg.norm(np.asarray(v).ravel())
        hi = list(args)
        lo = list(args)
        hi[argnum] = args[argnum] + eps * v
        lo[argnum] = args[argnum] - eps * v
        fd = (float(lfn(*hi)) - float(lfn(*lo))) / (2 * eps)
        an = float(jnp.sum(g[argnum] * v))
        assert abs(an) > 1e-8, "gradient identically zero"
        np.testing.assert_allclose(fd, an, rtol=rtol)

    def test_grad_density(self, grads):
        args, lfn, _, g = grads
        rng = np.random.RandomState(0)
        v = jnp.asarray(rng.randn(*args[0].shape), jnp.float32)
        self._directional_check(args, lfn, g, 0, v, eps=3e-3, rtol=5e-2)

    def test_grad_tf_colors(self, grads):
        args, lfn, _, g = grads
        rng = np.random.RandomState(1)
        v = jnp.asarray(rng.rand(*args[1].shape) * 0.5 + 0.1, jnp.float32)
        self._directional_check(args, lfn, g, 1, v, eps=2e-3, rtol=5e-2)

    def test_grad_albedo(self, grads):
        args, lfn, _, g = grads
        # perturb only the scattering opacity channel (the albedo lever)
        v = jnp.zeros_like(args[2]).at[:, 3].set(jnp.array([0.7, 1.0]))
        self._directional_check(args, lfn, g, 2, v, eps=2e-3, rtol=5e-2)

    def test_grad_light_radiance_exact(self, grads):
        """Paths are radiance-independent, so this gradient is exact:
        loss is linear in the per-channel scale."""
        args, lfn, val, g = grads
        for c in range(3):
            v = jnp.zeros(3, jnp.float32).at[c].set(1.0)
            hi = list(args)
            hi[3] = args[3] + 0.5 * v
            an = float(jnp.sum(g[3] * v))
            fd = (float(lfn(*hi)) - val) / 0.5  # exact for a linear map
            np.testing.assert_allclose(fd, an, rtol=1e-4)


def test_replay_rejects_no_single_scattering(setup_module=None):
    """ADVICE round 4: no_single_scattering traces are not replayable (the
    first event's position is unstored); replay must raise, not silently
    diverge by ~4pi."""
    import pytest

    from cpm_tpu.core.types import (LightSamples, PhotonData,
                                    TransferFunction, Volume)
    from cpm_tpu.io import synthetic

    vol = Volume.from_data(synthetic.smoke_cloud(8, seed=0))
    tf = TransferFunction.from_points(*synthetic.default_tf_points())
    tfs = TransferFunction.from_points(*synthetic.default_scattering_points())
    ph = PhotonData.create(4, 2)
    ls = LightSamples(origins=jnp.zeros((4, 3)), directions=jnp.zeros((4, 3)),
                      powers=jnp.ones((4, 3)), tspan=jnp.zeros((4, 2)),
                      iteration=jnp.int32(0))
    with pytest.raises(NotImplementedError, match="no_single_scattering"):
        replay.replay_powers(vol, tf, tfs, ph, ls,
                             no_single_scattering=True)
