#!/usr/bin/env python
"""Temporal (two-level banded) DP vs the sequential scan DP on TPU: measure
the horizon-length crossover on ONE chip (VERDICT round 1 item 3's last
deliverable; the temporal form's real purpose is sequence-sharding the time
axis, but the single-chip crossover locates where its log-depth chunk
reduction starts beating the O(nt) scan's per-step dispatch overhead).

Fishing-preset control set (SOS1, L=3, smax=2); budget scales with nt like
the preset (B = Δ⁰/τ with Δ⁰=2, T=12).

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/temporal_tpu.py [nt ...]
"""

import sys
import time

import numpy as np


def bench(fn, grad, u_old, reps=3):
    """Warm best-of-N with UNIQUE inputs per rep and a VALUE READBACK inside
    the timed region: `block_until_ready` through the axon tunnel returns
    before device completion and identical dispatches can be served without
    re-execution (round-3 finding, CLAUDE.md) — the original
    same-inputs/block-only version of this harness was unreliable."""
    import jax
    import jax.numpy as jnp

    out = fn(grad, u_old)
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(1, reps + 1):
        g = grad + jnp.float32(r * 1e-6)
        t0 = time.perf_counter()
        o = fn(g, u_old)
        float(jnp.sum(o[1].astype(jnp.float32)))  # readback = completion
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    fixed_B = None
    args = sys.argv[1:]
    if args and args[0].startswith("--B="):
        fixed_B = int(args[0][4:])   # long-horizon fixed-budget scenario
        args = args[1:]
    nts = [int(a) for a in args] or [1024, 4096, 16384]

    import jax
    import jax.numpy as jnp

    from mioc_tpu.ops.bellman import dp_solve, stage_tables
    from mioc_tpu.ops.levels import bounded_sum_levels, jump_cost_table
    from mioc_tpu.parallel import temporal_dp_solve

    print(f"platform: {jax.devices()[0].platform}")
    adm = bounded_sum_levels([[0, 1]] * 3, 1, 1)
    levels = jnp.asarray(adm.levels, jnp.float32)
    jump = jnp.asarray(jump_cost_table(adm.levels, p=np.inf, beta=1e-4),
                       jnp.float32)
    rng = np.random.default_rng(0)

    for nt in nts:
        tau = 12.0 / nt
        B = fixed_B if fixed_B is not None else int(2.0 / tau)
        grad = jnp.asarray(rng.normal(size=(nt, adm.M)), jnp.float32)
        u_old = jnp.asarray(adm.levels[rng.integers(0, adm.L, size=nt)],
                            jnp.float32)
        t_s, (u_s, i_s, _) = bench(
            lambda g, u: dp_solve(g, u, levels, jump, tau, B), grad, u_old)
        t_t, (u_t, i_t, _) = bench(
            lambda g, u: temporal_dp_solve(g, u, levels, jump, tau, B),
            grad, u_old)
        # equal COST (argmin ties may flip between the two associations)
        stage, _ = stage_tables(grad, u_old, levels, tau)
        st, jc = np.asarray(stage), np.asarray(jump)

        def cost(i):
            i = np.asarray(i)
            return st[np.arange(nt), i].sum() + jc[i[:-1], i[1:]].sum()

        ok = abs(cost(i_t) - cost(i_s)) <= 1e-4 * max(1.0, abs(cost(i_s)))
        print(f"nt={nt:6d} B={B:5d}: scan {1e3 * t_s:9.2f} ms | "
              f"temporal {1e3 * t_t:9.2f} ms | ratio {t_s / t_t:5.2f}x | "
              f"equal-cost {ok}", flush=True)


if __name__ == "__main__":
    main()
