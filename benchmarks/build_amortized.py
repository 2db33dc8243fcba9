#!/usr/bin/env python
"""Dispatch-amortized DP-build timing: scan vs batched Pallas, fishing shape.

The per-dispatch tunnel latency (~23 ms) swamps single-build timings, so this
chains N builds inside ONE jit (each build's stage input is perturbed by a
data-dependent epsilon from the previous build's U table, preventing XLA from
hoisting or deduplicating the loop body) and divides.  This isolates the pure
kernel time of the two DP builds — the quantity the e2e multistart comparison
(benchmarks/multistart_tpu.py) can only show as a lump.

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/build_amortized.py [S] [nt] [N]
"""

import math
import sys
import time

import numpy as np


def amortized(fn, stage, btilde, jump, N, reps=3):
    """block_until_ready alone is unreliable through the axon tunnel for
    tiny outputs (returns before execution), so force a host read of the
    result and perturb the input each rep to defeat any call memoization."""
    import numpy as _np
    run = fn(N)
    _np.asarray(run(stage, btilde, jump))
    best = float("inf")
    import jax
    sts = [jax.block_until_ready(stage + 1e-6 * r) for r in range(1, reps + 1)]
    for st in sts:
        t0 = time.perf_counter()
        out = _np.asarray(run(st, btilde, jump))
        best = min(best, time.perf_counter() - t0)
    del out
    return best / N


if __name__ == "__main__":
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    import jax
    import jax.numpy as jnp

    from mioc_tpu.models import registry
    from mioc_tpu.ops.bellman import (build_tables, max_budget_use,
                                      stage_tables)
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas_batched
    from mioc_tpu.ops.levels import jump_cost_table
    from mioc_tpu.solvers.trm import TRMParameters
    from mioc_tpu.utils.init import rand_func

    print(f"platform: {jax.devices()[0].platform}, S={S}, nt={nt}, N={N}",
          flush=True)
    spec = registry.get("fishing")
    obj = spec.factory(nt=nt)
    par = TRMParameters(**spec.preset)
    levels = np.asarray(obj.admissible.levels)
    smax = max_budget_use(levels)
    B = int(math.floor(par.delta0 / obj.tau))
    jump = jnp.asarray(
        jump_cost_table(levels, par.p, beta=par.beta,
                        compat_pinf=par.compat_pinf), jnp.float32)
    print(f"L={levels.shape[0]}, B={B}, smax={smax}", flush=True)

    rng = np.random.default_rng(0)
    u_olds = jnp.asarray(np.stack(
        [np.asarray(rand_func(obj, seed=s)) for s in range(S)]), jnp.float32)
    grads = jnp.asarray(rng.standard_normal((S, nt, obj.nx)), jnp.float32)
    lv = jnp.asarray(levels, jnp.float32)

    stage, btilde = jax.jit(jax.vmap(stage_tables, in_axes=(0, 0, None, None))
                            )(grads, u_olds, lv, float(obj.tau))
    jax.block_until_ready((stage, btilde))

    def chain(build):
        def make(N):
            @jax.jit
            def run(stage, btilde, jump):
                def body(i, c):
                    st, acc = c
                    U, phi0 = build(st, btilde, jump)
                    # Runtime-zero (argmin indices are >= 0) but NOT
                    # statically-zero epsilon: XLA folds `U*0 -> 0` and then
                    # hoists the loop-invariant build; min(U[0], 0) it cannot.
                    eps = jnp.minimum(U.reshape(-1)[0], 0).astype(st.dtype)
                    return st + eps, acc + phi0.reshape(-1)[:8]
                _, acc = jax.lax.fori_loop(
                    0, N, body, (stage, jnp.zeros(8, jnp.float32)))
                return acc
            return run
        return make

    vscan = jax.vmap(lambda s, b, j: build_tables(s, b, j, B, smax),
                     in_axes=(0, 0, None))
    t = amortized(chain(vscan), stage, btilde, jump, N)
    print(f"scan build (vmap)        : {1e3 * t:8.3f} ms/build", flush=True)

    for ur in (1, 4, 8, 16):
        pb = lambda s, b, j, ur=ur: build_tables_pallas_batched(
            s, b, j, B, smax, unroll=ur)
        t = amortized(chain(pb), stage, btilde, jump, N)
        print(f"pallas build (unroll={ur:2d}) : {1e3 * t:8.3f} ms/build",
              flush=True)
