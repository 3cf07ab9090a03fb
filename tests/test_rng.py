"""Counter RNG: bit-exactness vs jax's threefry, uniformity, stream
independence, shard invariance."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.ops import rng


class TestThreefry:
    def test_matches_jax_threefry(self):
        # jax.random is built on the same Threefry-2x32/20 core; feeding the
        # same key/counter words must reproduce its bits exactly.
        try:
            from jax._src.prng import threefry_2x32
        except ImportError:  # pragma: no cover - jax internals moved
            return
        k = jnp.array([0x12345678, 0x9ABCDEF0], jnp.uint32)
        c = jnp.arange(8, dtype=jnp.uint32)
        ref = np.asarray(threefry_2x32(k, c))
        # jax splits the flat count into halves: pairs are (c[i], c[i+4]).
        x0, x1 = rng.threefry2x32(k[0], k[1], c[:4], c[4:])
        got = np.concatenate([np.asarray(x0), np.asarray(x1)])
        np.testing.assert_array_equal(got, ref)

    def test_known_zero_vector(self):
        # Random123 test vector: threefry2x32(key=0, ctr=0) with 20 rounds.
        x0, x1 = rng.threefry2x32(
            jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0))
        assert (int(x0), int(x1)) == (0x6B200159, 0x99BA4EFE)


class TestUniforms:
    def _draw(self, n=4096, step=0, seed=0, draws=5):
        k0, k1 = rng.key_words(jax.random.PRNGKey(seed))
        lanes = jnp.arange(n, dtype=jnp.int32)
        return np.asarray(rng.uniforms(k0, k1, lanes, jnp.int32(step), draws))

    def test_range_and_moments(self):
        u = self._draw(n=1 << 14)
        assert u.shape == (1 << 14, 5)
        assert (u >= 0).all() and (u < 1).all()
        assert abs(u.mean() - 0.5) < 0.005
        assert abs(u.var() - 1.0 / 12.0) < 0.003

    def test_steps_and_seeds_independent(self):
        a = self._draw(step=0)
        b = self._draw(step=1)
        c = self._draw(step=0, seed=1)
        assert not np.array_equal(a, b)
        assert not np.array_equal(a, c)
        # adjacent-step correlation ~ 0
        assert abs(np.corrcoef(a.ravel(), b.ravel())[0, 1]) < 0.02

    def test_shard_invariance(self):
        """uniforms over a lane slice == the slice of global uniforms."""
        k0, k1 = rng.key_words(jax.random.PRNGKey(3))
        all_lanes = jnp.arange(1024, dtype=jnp.int32)
        full = np.asarray(rng.uniforms(k0, k1, all_lanes, jnp.int32(7), 5))
        shard = np.asarray(
            rng.uniforms(k0, k1, all_lanes[256:512], jnp.int32(7), 5))
        np.testing.assert_array_equal(full[256:512], shard)
