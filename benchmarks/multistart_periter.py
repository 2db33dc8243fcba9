#!/usr/bin/env python
"""Per-outer-iteration in-situ timing of the batched multistart TRM, scan vs
batched-Pallas DP.  Segments the vmapped solve with outer_chunk so every
segment is a separate dispatch; the per-iteration difference between the two
paths isolates the in-situ DP-build cost (the isolated chained DP step —
benchmarks/dpstep_amortized.py — shows Pallas WINNING, yet e2e loses; this
locates the discrepancy).

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/multistart_periter.py [S] [nt] [CHUNK]
"""

import sys
import time

import numpy as np

from mioc_tpu.models import registry
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import multistart_solve_device
from mioc_tpu.utils.init import rand_func


def run_segmented(obj, par, x0s, use_pallas, chunk):
    segs = []

    def progress(it, elapsed):
        segs.append((it, elapsed))

    res = multistart_solve_device(obj, par, x0s, use_pallas=use_pallas,
                                  outer_chunk=chunk, progress=progress)
    # warm rerun: compile already cached
    segs.clear()
    t0 = time.perf_counter()
    res = multistart_solve_device(obj, par, x0s, use_pallas=use_pallas,
                                  outer_chunk=chunk, progress=progress)
    total = time.perf_counter() - t0
    return res, segs, total


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import jax

    print(f"platform: {jax.devices()[0].platform}, S={S}, nt={nt}, "
          f"chunk={chunk}")
    spec = registry.get("fishing")
    obj = spec.factory(nt=nt)
    par = TRMParameters(**spec.preset)
    x0s = np.stack([np.asarray(rand_func(obj, seed=s)) for s in range(S)])

    for name, up in (("scan", False), ("pallas", True)):
        res, segs, total = run_segmented(obj, par, x0s, up, chunk)
        iters = int(np.max(np.asarray(res.iterations)))
        inner = int(np.max(np.asarray(res.inner_steps)))
        # drop the first segment (residual warmup) for the per-iter figure
        warm = segs[1:] if len(segs) > 2 else segs
        it_done = warm[-1][0] - (segs[0][0] if len(segs) > 2 else 0)
        t_warm = sum(e for _, e in warm)
        print(f"{name:7s}: total {total:6.3f} s, outer_max={iters}, "
              f"inner_max={inner}, segments={len(segs)}, "
              f"warm {1e3 * t_warm / max(it_done, 1):7.2f} ms/outer-iter")

    # reference: single-dispatch totals
    for name, up in (("scan", False), ("pallas", True)):
        res = multistart_solve_device(obj, par, x0s, use_pallas=up)
        t0 = time.perf_counter()
        res = multistart_solve_device(obj, par, x0s, use_pallas=up)
        print(f"{name:7s} single-dispatch: {time.perf_counter() - t0:6.3f} s")


if __name__ == "__main__":
    main()
