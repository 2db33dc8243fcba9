#!/usr/bin/env python
"""Decide the batched-multistart DP default: XLA-scan vs batched Pallas.

Round 1 shipped the batched DP as a sequential grid over starts, which LOST
to the vmapped scan (75 vs 50 ms/solve at x32 fishing nt=1024 on v5e) —
VERDICT round 1, item 2.  Round 2 folds the start axis INSIDE one kernel
invocation ((S*Lp) sublanes x Bp lanes — ops/bellman_pallas.py
_dp_kernel_batched); this script measures both paths at the same workload
and checks the results bit-match.

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/multistart_tpu.py [S] [nt] [problem] [outer_chunk]

The optional ``problem`` (default fishing) selects any registered model —
``heat`` measures the L=36/Lp=40 shape where the batched kernels' VMEM
budget actually bites (VERDICT r2 item 6).  ``outer_chunk`` (int) segments
each batched solve so a slow PDE batch stays under the runtime's execution
deadline.
"""

import sys
import time

import numpy as np

from mioc_tpu.models import registry
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import multistart_solve_device
from mioc_tpu.utils.init import rand_func


def measure(obj, par, x0s, use_pallas, reps=3, outer_chunk=None,
            speculative=False):
    kw = dict(use_pallas=use_pallas, outer_chunk=outer_chunk,
              speculative=speculative)
    res = multistart_solve_device(obj, par, x0s, **kw)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = multistart_solve_device(obj, par, x0s, **kw)
        best = min(best, time.perf_counter() - t0)
    return best, res


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    problem = sys.argv[3] if len(sys.argv) > 3 else "fishing"
    outer_chunk = int(sys.argv[4]) if len(sys.argv) > 4 else None

    import jax

    print(f"platform: {jax.devices()[0].platform}, S={S}, nt={nt}, "
          f"problem={problem}, outer_chunk={outer_chunk}")
    spec = registry.get(problem)
    obj = spec.factory(nt=nt)
    par = TRMParameters(**spec.preset)
    x0s = np.stack([np.asarray(rand_func(obj, seed=s)) for s in range(S)])

    t_scan, r_scan = measure(obj, par, x0s, use_pallas=False, outer_chunk=outer_chunk)
    print(f"scan DP   : {t_scan:.3f} s total, {1e3 * t_scan / S:.1f} ms/solve, "
          f"{int(np.sum(r_scan.converged))}/{S} converged, "
          f"best J={float(np.min(r_scan.J)):.6f}")

    t_pal, r_pal = measure(obj, par, x0s, use_pallas=True, outer_chunk=outer_chunk)
    print(f"pallas DP : {t_pal:.3f} s total, {1e3 * t_pal / S:.1f} ms/solve, "
          f"{int(np.sum(r_pal.converged))}/{S} converged, "
          f"best J={float(np.min(r_pal.J)):.6f}")

    match = np.array_equal(np.asarray(r_scan.u), np.asarray(r_pal.u))
    print(f"controls bit-match: {match}")
    print(f"speedup pallas/scan: {t_scan / t_pal:.2f}x")

    # Round 4: speculative trial waves composed with the batched multistart
    # (one trial-wave chase kernel + (S, K)-batched trial sweeps per outer
    # iteration) — the default production path when the objective's batched
    # sweeps are bit-stable.
    t_spec, r_spec = measure(obj, par, x0s, use_pallas=True,
                             outer_chunk=outer_chunk, speculative=True)
    print(f"pallas+spec wave: {t_spec:.3f} s total, "
          f"{1e3 * t_spec / S:.1f} ms/solve, "
          f"{int(np.sum(r_spec.converged))}/{S} converged, "
          f"best J={float(np.min(r_spec.J)):.6f}")
    match_s = np.array_equal(np.asarray(r_spec.u), np.asarray(r_pal.u))
    print(f"speculative controls bit-match sequential: {match_s}")
    print(f"speedup spec/sequential-pallas: {t_pal / t_spec:.2f}x; "
          f"spec/scan: {t_scan / t_spec:.2f}x")


if __name__ == "__main__":
    main()
