"""Autotuner (the clogs measure-and-cache role): measures once, caches the
winner per device kind, and the cached winner short-circuits re-measuring."""

import jax.numpy as jnp

from cpm_tpu.utils import autotune


def test_measures_once_then_caches(tmp_path):
    path = str(tmp_path / "cache.json")
    calls = {"a": 0, "b": 0}

    def mk(label, work):
        def thunk():
            calls[label] += 1
            x = jnp.ones((work,))
            return jnp.sum(x * x)
        return thunk

    cands = {"a": mk("a", 1 << 20), "b": mk("b", 1 << 8)}
    best1 = autotune.autotune("unit_test_knob", cands, cache_path=path,
                              reps=2)
    assert best1 in cands
    n_after_first = dict(calls)
    assert all(v > 0 for v in n_after_first.values())

    best2 = autotune.autotune("unit_test_knob", cands, cache_path=path)
    assert best2 == best1
    assert calls == n_after_first  # cache hit: no re-measurement

    best3 = autotune.autotune("unit_test_knob", cands, cache_path=path,
                              force=True, reps=1)
    assert best3 in cands
    assert calls != n_after_first  # forced re-measure


def test_tune_binned_splat_returns_valid_shape(tmp_path):
    out = autotune.tune_binned_splat(4096, (33, 33, 33),
                                     cache_path=str(tmp_path / "c.json"))
    assert out["k_cap"] in (2048, 4096, 8192)
    assert out["a_chunk"] in (32, 64, 128)
    # Cached second call returns instantly with the same result.
    out2 = autotune.tune_binned_splat(4096, (33, 33, 33),
                                      cache_path=str(tmp_path / "c.json"))
    assert out2 == out
