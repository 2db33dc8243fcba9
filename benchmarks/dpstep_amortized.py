#!/usr/bin/env python
"""Dispatch-amortized DP-STEP timing (build + backtrack chained), fishing
shape: pinpoints where the e2e multistart gap between the scan path and the
batched Pallas path comes from.

Variants (each chained N times inside ONE jit, input perturbed by a
runtime-zero epsilon so XLA cannot hoist the loop body):

  scan      : vmapped XLA-scan build  -> vmapped scan backtrack (compact)
  pallas    : batched Pallas build    -> vmapped scan backtrack (PADDED)
  pallas+sl : batched Pallas build    -> slice U/phi0 to compact -> backtrack

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/dpstep_amortized.py [S] [nt] [N]
"""

import math
import sys
import time

import numpy as np


def amortized(make, stage, btilde, jump, N, reps=3):
    import jax
    import numpy as _np
    run = make(N)
    _np.asarray(run(stage, btilde, jump))
    best = float("inf")
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
    from mioc_tpu.ops.bellman import (backtrack, build_tables, max_budget_use,
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
    L = levels.shape[0]
    jump = jnp.asarray(
        jump_cost_table(levels, par.p, beta=par.beta,
                        compat_pinf=par.compat_pinf), jnp.float32)
    print(f"L={L}, B={B}, smax={smax}", flush=True)

    rng = np.random.default_rng(0)
    u_olds = jnp.asarray(np.stack(
        [np.asarray(rand_func(obj, seed=s)) for s in range(S)]), jnp.float32)
    grads = jnp.asarray(rng.standard_normal((S, nt, obj.nx)), jnp.float32)
    lv = jnp.asarray(levels, jnp.float32)

    stage, btilde = jax.jit(jax.vmap(stage_tables, in_axes=(0, 0, None, None))
                            )(grads, u_olds, lv, float(obj.tau))
    jax.block_until_ready((stage, btilde))

    vbt = jax.vmap(lambda U, p0, bt: backtrack(U, p0, bt, lv, jnp.int32(B)),
                   in_axes=(0, 0, 0))

    def chain(dp_step):
        """dp_step(stage, btilde, jump) -> (level_idx (S, nt), feedback f32)."""
        def make(N):
            @jax.jit
            def run(stage, btilde, jump):
                def body(i, c):
                    st, acc = c
                    li = dp_step(st, btilde, jump)
                    # Runtime-zero feedback (indices >= 0; min with 0 is 0 at
                    # runtime but not statically) prevents hoisting.
                    eps = jnp.minimum(li.reshape(-1)[0], 0).astype(st.dtype)
                    return st + eps, acc + li[:, ::257].astype(jnp.float32).sum()
                _, acc = jax.lax.fori_loop(
                    0, N, body, (stage, jnp.float32(0.0)))
                return acc
            return run
        return make

    def scan_step(st, bt, j):
        U, p0 = jax.vmap(lambda s, b: build_tables(s, b, j, B, smax),
                         in_axes=(0, 0))(st, bt)
        _, li = vbt(U, p0, bt)
        return li

    def pallas_step(st, bt, j, unroll=8):
        U, p0 = build_tables_pallas_batched(st, bt, j, B, smax, unroll=unroll)
        _, li = vbt(U, p0, bt)
        return li

    def pallas_slice_step(st, bt, j, unroll=8):
        U, p0 = build_tables_pallas_batched(st, bt, j, B, smax, unroll=unroll)
        _, li = vbt(U[:, :, :L, :B + 1], p0[:, :L, :B + 1], bt)
        return li

    # Parity first (single dispatch each).
    li_s = jax.jit(scan_step)(stage, btilde, jump)
    li_p = jax.jit(pallas_step)(stage, btilde, jump)
    li_q = jax.jit(pallas_slice_step)(stage, btilde, jump)
    print("paths bit-match (padded):", bool(jnp.array_equal(li_s, li_p)),
          " (sliced):", bool(jnp.array_equal(li_s, li_q)), flush=True)

    for name, step in (("scan  build+bt        ", scan_step),
                       ("pallas build+bt padded", pallas_step),
                       ("pallas build+bt sliced", pallas_slice_step)):
        t = amortized(chain(step), stage, btilde, jump, N)
        print(f"{name}: {1e3 * t:8.3f} ms/step", flush=True)
