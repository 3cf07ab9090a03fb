"""Bisect the mystery 50ms/iter overhead of scanning the full-state step."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cpm_tpu.ops import select
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.utils.benchmark import readback

import bench as bench_mod

K = 10


def scan_time(name, body, init_carry):
    f = jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(K))[0])
    out = f(init_carry)
    readback(out)
    t0 = time.perf_counter()
    out = f(init_carry)
    readback(out)
    dt = time.perf_counter() - t0
    print(f"{name:>44}: {dt / K * 1e3:7.2f} ms/iter")


def main():
    scene, config = bench_mod.build(128, (256, 256), 4, width=512)
    state = pstep.init_state(scene, config)
    out = pstep.full_trace_step(scene, state, config)
    readback(out.light_volume)
    budget = pstep.recompute_budget(config, state.photons.n)
    n = state.photons.n
    imp = jax.random.uniform(jax.random.PRNGKey(3), (n,))

    # A: carry scalar, select only (closure state)
    def body_a(c, i):
        idx, valid, nr = select.select_photons_to_recompute(
            imp + c * 1e-9, budget, exclude=None)
        return idx[0].astype(jnp.float32), None
    scan_time("A scalar carry, select", body_a, jnp.float32(0.0))

    # B: carry full state, select only, state untouched
    def body_b(c, i):
        idx, valid, nr = select.select_photons_to_recompute(
            imp + c.recompute_phase.astype(jnp.float32) * 1e-9, budget,
            exclude=None)
        return c.replace(recompute_phase=c.recompute_phase
                         + idx[0] * 0), None
    scan_time("B full-state carry, select", body_b, out)

    # C: carry state, select + exclude from carried retraced
    def body_c(c, i):
        idx, valid, nr = select.select_photons_to_recompute(
            imp, budget, exclude=jnp.zeros_like(c.retraced))
        retraced = c.retraced.at[idx].set(True, mode="drop")
        return c.replace(retraced=jnp.where(nr > 0, retraced,
                                            jnp.zeros_like(retraced)),
                         n_remaining=nr), None
    scan_time("C + retraced bookkeeping", body_c, out)

    # D: C + sub-bundle gather
    def body_d(c, i):
        idx, valid, nr = select.select_photons_to_recompute(
            imp, budget, exclude=jnp.zeros_like(c.retraced))
        safe = jnp.where(valid, idx, 0)
        ls = c.light_samples
        s = (ls.origins[safe].sum() + ls.directions[safe].sum()
             + ls.powers[safe].sum() + ls.tspan[safe].sum())
        retraced = c.retraced.at[idx].set(True, mode="drop")
        return c.replace(retraced=retraced,
                         n_remaining=nr + s.astype(jnp.int32) * 0), None
    scan_time("D + sub-bundle gather", body_d, out)

    # E: D + photons gather-write (merged = photons scatter at indices)
    def body_e(c, i):
        idx, valid, nr = select.select_photons_to_recompute(
            imp, budget, exclude=jnp.zeros_like(c.retraced))
        safe = jnp.where(valid, idx, 0)
        ph = c.photons
        newpos = ph.positions[:, safe]
        merged = ph.replace(
            positions=ph.positions.at[:, safe].set(newpos * 1.0))
        return c.replace(photons=merged, n_remaining=nr), None
    scan_time("E + photons scatter-merge", body_e, out)

    # F: equal-importance compute (no select)
    def body_f(c, i):
        retraced = c.retraced.at[i].set(True, mode="drop")
        return c.replace(retraced=retraced), None
    scan_time("F state carry, trivial body", body_f, out)


if __name__ == "__main__":
    main()
