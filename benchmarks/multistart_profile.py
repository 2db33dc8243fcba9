#!/usr/bin/env python
"""Component-level profile of the batched (x S) multistart DP at the fishing
shape: where do the ms/solve go, and which DP build wins?

Times, each as a separate dispatch (warm, best of N with block_until_ready):
  * vmapped XLA-scan build_tables (the current multistart default),
  * batched Pallas build (start axis inside one kernel), unroll 1/4/8,
  * vmapped scan backtrack on unpadded vs Pallas-padded tables,
  * the batched forward (f) and adjoint (df) sweeps.

All arrays are passed as explicit jit arguments — capturing device arrays in
jitted closures permanently degrades every dispatch on the axon runtime
(CLAUDE.md).

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/multistart_profile.py [S] [nt]
"""

import math
import sys
import time

import numpy as np


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


if __name__ == "__main__":
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    import jax
    import jax.numpy as jnp

    from mioc_tpu.models import registry
    from mioc_tpu.ops.bellman import (backtrack, build_tables, max_budget_use,
                                      stage_tables)
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas_batched
    from mioc_tpu.ops.levels import jump_cost_table
    from mioc_tpu.solvers.trm import TRMParameters
    from mioc_tpu.utils.init import rand_func

    print(f"platform: {jax.devices()[0].platform}, S={S}, nt={nt}")
    spec = registry.get("fishing")
    obj = spec.factory(nt=nt)
    par = TRMParameters(**spec.preset)
    adm = obj.admissible
    levels = np.asarray(adm.levels)
    smax = max_budget_use(levels)
    B = int(math.floor(par.delta0 / obj.tau))
    jump = jnp.asarray(jump_cost_table(levels, par.p, beta=par.beta,
                                       compat_pinf=par.compat_pinf),
                       dtype=jnp.float32)
    L = levels.shape[0]
    tau = float(obj.tau)
    print(f"L={L}, B={B}, smax={smax}")

    rng = np.random.default_rng(0)
    u_olds = jnp.asarray(np.stack(
        [np.asarray(rand_func(obj, seed=s)) for s in range(S)]), jnp.float32)
    grads = jnp.asarray(rng.standard_normal((S, nt, obj.nx)), jnp.float32)
    lv = jnp.asarray(levels, jnp.float32)

    vstage = jax.jit(jax.vmap(stage_tables, in_axes=(0, 0, None, None)))
    stage, btilde = vstage(grads, u_olds, lv, tau)
    jax.block_until_ready((stage, btilde))

    # 1. vmapped scan build  (B/smax are python ints: baked literals, fine)
    def _build1(s, b, j):
        return build_tables(s, b, j, B, smax)

    vbuild = jax.jit(jax.vmap(_build1, in_axes=(0, 0, None)))
    t, (U_s, phi_s) = bench(vbuild, stage, btilde, jump)
    print(f"scan build (vmap)        : {1e3 * t:8.2f} ms   U{U_s.shape}")

    # 2. batched pallas build, unrolls
    U_p = phi_p = None
    for ur in (1, 4, 8):
        fn = jax.jit(lambda s, b, j, ur=ur: build_tables_pallas_batched(
            s, b, j, B, smax, unroll=ur))
        t, (U_p, phi_p) = bench(fn, stage, btilde, jump)
        print(f"pallas build (unroll={ur})  : {1e3 * t:8.2f} ms   U{U_p.shape}")

    # parity vs scan tables (inf == inf compares equal in array_equal)
    ok_phi = bool(jnp.array_equal(phi_s, phi_p[:, :L, :B + 1]))
    print(f"phi0 match: {ok_phi}")

    # 3. vmapped backtrack: unpadded vs padded tables
    def _bt1(U, p0, bt, lvv):
        return backtrack(U, p0, bt, lvv, jnp.int32(B))

    vbt = jax.jit(jax.vmap(_bt1, in_axes=(0, 0, 0, None)))
    t, out_s = bench(vbt, U_s, phi_s, btilde, lv)
    print(f"backtrack (unpadded)     : {1e3 * t:8.2f} ms")
    t, out_p = bench(vbt, U_p, phi_p, btilde, lv)
    print(f"backtrack (padded)       : {1e3 * t:8.2f} ms")
    print("controls bit-match:",
          bool(jnp.array_equal(out_s[0], out_p[0])))

    # 4. batched forward/adjoint sweeps (sweep ops passed explicitly, like
    # the device TRM does)
    ops = obj._sweep_ops()
    vfwd = jax.jit(jax.vmap(obj._forward_with, in_axes=(0, None)))
    t, (f, ys) = bench(vfwd, u_olds, ops)
    print(f"forward sweep (vmap)     : {1e3 * t:8.2f} ms")
    vadj = jax.jit(jax.vmap(obj._adjoint_with, in_axes=(0, 0, None)))
    t, _ = bench(vadj, u_olds, ys, ops)
    print(f"adjoint sweep (vmap)     : {1e3 * t:8.2f} ms")
