#!/usr/bin/env python
"""Measure guarded loop-unrolling for the batched multistart solve.

The round-4 xplane profile (multistart_trace.py, BASELINE_SELF.md) attributed
~60% of ×32 fishing multistart device time to while-loop self time: ~0.5 ms
per inner trial and ~5.6 ms per outer iteration of unattributed loop
overhead.  ``outer_unroll``/``inner_unroll`` run N guarded steps per
while-loop iteration (bit-identical by construction — masked steps select
the old carry), paying ≤ N−1 masked steps at each loop tail to save N−1
condition syncs everywhere else.  This script sweeps the grid and checks the
controls bit-match the baseline.

Run on the TPU (ONE process at a time — CLAUDE.md):
    timeout 3000 python benchmarks/multistart_unroll.py [S] [nt]
"""

import sys
import time

import numpy as np

from mioc_tpu.models import registry
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import multistart_solve_device
from mioc_tpu.utils.init import rand_func


def measure(obj, par, x0s, reps=3, **kw):
    multistart_solve_device(obj, par, x0s, **kw)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = multistart_solve_device(obj, par, x0s, **kw)
        best = min(best, time.perf_counter() - t0)
    return best, res


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    import jax

    print(f"platform: {jax.devices()[0].platform}, S={S}, nt={nt}", flush=True)
    spec = registry.get("fishing")
    obj = spec.factory(nt=nt)
    par = TRMParameters(**spec.preset)
    x0s = np.stack([np.asarray(rand_func(obj, seed=s)) for s in range(S)])

    t_base, base = measure(obj, par, x0s)
    print(f"baseline (ou=1, iu=1, seq): {t_base * 1e3 / S:8.2f} ms/solve  "
          f"conv={int(np.sum(base.converged))}/{S}", flush=True)

    grid = [
        dict(outer_unroll=2, inner_unroll=1),
        dict(outer_unroll=1, inner_unroll=2),
        dict(outer_unroll=2, inner_unroll=2),
        dict(outer_unroll=4, inner_unroll=1),
        dict(outer_unroll=4, inner_unroll=2),
        dict(outer_unroll=2, inner_unroll=4),
        dict(outer_unroll=8, inner_unroll=2),
        dict(speculative=True),
        dict(speculative=True, outer_unroll=2),
        dict(speculative=True, outer_unroll=4),
    ]
    for kw in grid:
        try:
            t, res = measure(obj, par, x0s, **kw)
        except Exception as e:
            print(f"{kw}: FAILED {e!r}", flush=True)
            continue
        ok = np.array_equal(np.asarray(res.u), np.asarray(base.u))
        its = np.array_equal(np.asarray(res.iterations),
                             np.asarray(base.iterations))
        print(f"{str(kw):55s}: {t * 1e3 / S:8.2f} ms/solve  "
              f"({t_base / t:4.2f}x)  u_bitmatch={ok} iters_match={its}",
              flush=True)


if __name__ == "__main__":
    main()
