#!/usr/bin/env python
"""int8 U-table A/B on chip (round 5).

The round-5 xplane profile attributed 47% of ×32 multistart device time to
the batched chase custom call — which is at 87% of the HBM bound streaming
the int32 U table (268 MB per chase at ×32 fishing).  Argmin indices fit
int8 for L ≤ 127 (every bundled problem), cutting that traffic 4× on both
the chase reads and the build writes (bellman_pallas._u_dtype, default
int8; MIOC_U_DTYPE=int32 restores round 4's layout).

This script (run per dtype: `MIOC_U_DTYPE=int8|int32 python …`):
  1. asserts the fused build+chase path is bit-identical to the XLA-scan
     path at the conv and fishing shapes (on-chip argmin parity);
  2. measures the conv build+chase pair (readback slope — bench.py method);
  3. measures ×32 fishing multistart ms/solve.

Run on the TPU (ONE process at a time — CLAUDE.md):
    timeout 2400 python benchmarks/u_dtype_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import dp_throughput, multistart_ms_per_solve
    from mioc_tpu.ops.backtrack_pallas import backtrack_pallas
    from mioc_tpu.ops.bellman import (backtrack, build_tables, max_budget_use,
                                      stage_tables)
    from mioc_tpu.ops.bellman_pallas import build_tables_pallas
    from mioc_tpu.ops.levels import bounded_sum_levels, product_levels

    print(f"platform={jax.devices()[0].platform} "
          f"MIOC_U_DTYPE={os.environ.get('MIOC_U_DTYPE', 'int8 (default)')}",
          flush=True)

    # -- 1. bit-identity vs the scan path ---------------------------------
    shapes = [
        ("conv", product_levels([[-2, -1, 0, 1, 2]]), 2048, 128, 1, 1e-4),
        ("fishing", bounded_sum_levels([[0, 1]] * 3, 1, 1), 1024, 170,
         np.inf, 1e-4),
    ]
    from mioc_tpu.ops.levels import jump_cost_table

    for name, adm, nt, B, p, beta in shapes:
        rng = np.random.default_rng(0)
        M = adm.levels.shape[1]
        grad = jnp.asarray(rng.normal(size=(nt, M)), jnp.float32)
        u_old = jnp.asarray(adm.levels[rng.integers(0, adm.L, size=nt)],
                            jnp.float32)
        levels = jnp.asarray(adm.levels, jnp.float32)
        jump = jnp.asarray(jump_cost_table(adm.levels, p=p, beta=beta),
                           jnp.float32)
        tau = 2.0 / nt
        smax = max_budget_use(adm.levels)
        stage, btilde = stage_tables(grad, u_old, levels, tau)
        Up, phip = build_tables_pallas(stage, btilde, jump, B, smax)
        _, idx_p = backtrack_pallas(Up, phip, btilde, levels, jnp.int32(B))
        Us, phis = build_tables(stage, btilde, jump, B, smax)
        _, idx_s = backtrack(Us, phis, btilde, levels, jnp.int32(B))
        ok = np.array_equal(np.asarray(idx_p), np.asarray(idx_s))
        print(f"{name}: U dtype={Up.dtype}, path bit-match vs scan: {ok}",
              flush=True)
        assert ok

    # -- 2. conv build+chase pair (slope) ---------------------------------
    rate, sol = dp_throughput(nt=2048, L=5, M=1, B=128,
                              levels_spec=[[-2, -1, 0, 1, 2]], p=1, beta=1e-4,
                              include_chase=True)
    per_pair_us = 2048 * 25 * 128 / rate * 1e6
    print(f"conv build+chase pair: {per_pair_us:.1f} us (r4 int32: 949.3)",
          flush=True)

    # -- 3. ×32 fishing multistart ----------------------------------------
    ms = multistart_ms_per_solve()
    print(f"x32 fishing multistart: {ms:.2f} ms/solve (r4 int32: 16.4)",
          flush=True)


if __name__ == "__main__":
    main()
