"""Speed-of-light accounting for the three hot kernels (BASELINE.md target:
">=80% speed-of-light"; VERDICT r4 missing #5).

For each kernel, build an operational lower bound from (a) the exact work
the kernel issues (instrumented via tracer return_stats, not estimated) and
(b) the honest measured rate of the bounding primitive on this chip, then
report measured time vs that bound as SoL%. All timings are in-jit
lax.scan loops with SMALL carries (the round-5 ground-truth protocol —
large-carry scans and per-rep readbacks both carry tunnel overheads).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cpm_tpu.ops import splat_binned, sweep_render, tracer as tracer_mod
from cpm_tpu.pipeline import step as pstep
from cpm_tpu.utils.benchmark import readback

import bench as bench_mod

OUT = {}


def scan_ms(body, init, reps=20, consts=()):
    """Scan-loop timing; pass big closed-over arrays via ``consts`` so they
    ship as buffers, not inline program constants (the axon remote-compile
    endpoint rejects >~100MB request bodies with HTTP 413)."""
    f = jax.jit(lambda c, cs: jax.lax.scan(
        lambda cc, i: body(cc, i, *cs), c, jnp.arange(reps))[0])
    readback(f(init, consts))
    t0 = time.perf_counter()
    readback(f(init, consts))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    scene, config = bench_mod.build(128, (256, 256), 4, width=512)
    state = pstep.init_state(scene, config)
    n = state.photons.n

    # ---------------- primitive rates (the walls) ----------------
    tbl = jax.random.normal(jax.random.PRNGKey(0), (1 << 18, 72))
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (1 << 20,), 0, 1 << 18)

    def g_body(c, i, tbl):
        r = tbl[c]
        s = jnp.sum(jnp.abs(r))
        return (c + jnp.sign(jnp.minimum(s, 1.0)).astype(jnp.int32)
                ) % (1 << 18), None

    ms = scan_ms(g_body, idx0, reps=10, consts=(tbl,))
    row_rate = idx0.shape[0] / (ms * 1e-3)
    print(f"row-gather wall (2^18 x 72 rows): {row_rate/1e6:.1f} M rows/s",
          file=sys.stderr)

    # ---------------- trace ----------------
    def t_body(key, i):  # closes over small scene arrays only
        ph = tracer_mod.trace_photons(
            scene.volume, scene.tf, scene.tf_scattering, state.light_samples,
            key, config.tracer)
        fb = jnp.sign(jnp.minimum(jnp.sum(jnp.abs(ph.powers)), 1.0))
        return jax.random.fold_in(key, fb.astype(jnp.uint32)), None

    trace_ms = scan_ms(t_body, state.key, reps=10)
    _, stats = tracer_mod.trace_photons(
        scene.volume, scene.tf, scene.tf_scattering, state.light_samples,
        state.key, config.tracer, return_stats=True)
    iters = float(stats["wavefront_iters"])
    flights = (float(stats["mean_active_frac"]) * iters * n
               * config.tracer.flights_per_iteration)
    sol_trace_ms = flights / row_rate * 1e3
    OUT["trace"] = dict(
        measured_ms=round(trace_ms, 2),
        bound="brick-row gather wall",
        work=f"{flights/1e6:.1f}M row fetches over {iters:.0f} iters",
        sol_ms=round(sol_trace_ms, 2),
        sol_pct=round(100 * sol_trace_ms / trace_ms, 1))

    # ---------------- binned splat at 16.7M deposits ----------------
    P = 1 << 24
    key = jax.random.PRNGKey(7)
    pos = jnp.clip(0.5 + 0.18 * jax.random.normal(key, (P, 3)), 0.0, 1.0)
    inval = jax.random.uniform(jax.random.fold_in(key, 1), (P,)) > 0.5
    pos = jnp.where(inval[:, None], 3.4e38, pos).astype(jnp.float32)
    pw = jax.random.uniform(jax.random.fold_in(key, 2), (P, 3))
    readback((pos, pw))
    readback(splat_binned.splat_binned_flat(pos, pw, 0.0153866, 1.0,
                                            (65, 65, 65)))  # warmup+compile
    t0 = time.perf_counter()
    out = splat_binned.splat_binned_flat(pos, pw, 0.0153866, 1.0,
                                         (65, 65, 65))
    readback(out)
    splat_ms = (time.perf_counter() - t0) * 1e3

    # Bound: sort of P keys + the two slot gathers over valid deposits.
    ki = jnp.arange(P, dtype=jnp.int32)
    kk = jax.random.randint(key, (P,), 0, 730, dtype=jnp.int32)

    def s_body(c, i, kk, ki):
        sk, sv = jax.lax.sort_key_val(kk + c, ki)
        return c + (sv[0] % 2), None

    sort_ms = scan_ms(s_body, jnp.int32(0), reps=3, consts=(kk, ki))
    n_valid = int(jnp.sum(~inval))
    data8 = jnp.concatenate([pos, pw, jnp.zeros((P, 2))], axis=1)
    sidx = jax.random.randint(key, (n_valid,), 0, P)

    def sl_body(c, i, data8, ki):
        r = data8[ki[c]]  # 1-D gather then row gather (the two slot hops)
        s = jnp.sum(jnp.abs(r[:, :1]))
        return (c + jnp.isfinite(s).astype(jnp.int32)) % P, None

    slot_ms = scan_ms(sl_body, sidx, reps=5, consts=(data8, ki))
    sol_splat = sort_ms + slot_ms
    OUT["splat_binned_16.7M"] = dict(
        measured_ms=round(splat_ms, 1),
        bound="tile sort + slot gathers",
        work=f"{P/1e6:.0f}M keys sorted, {n_valid/1e6:.1f}M slots x2 hops",
        sol_ms=round(sol_splat, 1),
        sol_pct=round(100 * sol_splat / splat_ms, 1))

    # ---------------- render ----------------
    from cpm_tpu.core.camera import Camera
    cam = Camera.create(eye=(0.4, 0.6, -1.4))
    lv0 = jnp.abs(jax.random.normal(key, (65, 65, 65, 3))) * 0.1

    def r_body(lv, i):  # volume closes over (128^3 = 8MB, under the cap)
        img = sweep_render.sweep_render(scene.volume, scene.tf, lv, cam,
                                        config.render)
        fb = jnp.sign(jnp.minimum(jnp.sum(img), 1.0))
        return lv * (0.999999 + 1e-6 * fb), None

    render_ms = scan_ms(r_body, lv0, reps=10)
    S = int(128 * config.render.sampling_rate)
    U = V = 768
    nc = nb = 128
    vpu_ops = S * U * V * 30  # TF classify + exp + composite per sample
    vpu_ms = vpu_ops / 1.0e12 * 1e3
    mxu_flops = S * (2 * V * nc * nb + 2 * V * nb * U
                     + 2 * V * 65 * 65 * 3 + 2 * V * U * 65 * 3) * 3
    mxu_ms = mxu_flops / 200e12 * 1e3
    sol_render = vpu_ms + mxu_ms
    OUT["render_sweep"] = dict(
        measured_ms=round(render_ms, 2),
        bound="VPU classify + bf16x3 MXU resample",
        work=f"{S} planes x {U}x{V}, {vpu_ops/1e9:.1f}G VPU ops, "
             f"{mxu_flops/1e9:.0f} GFLOP",
        sol_ms=round(sol_render, 2),
        sol_pct=round(100 * sol_render / render_ms, 1))

    print(json.dumps(OUT, indent=1))


if __name__ == "__main__":
    main()
