#!/usr/bin/env python
"""Capture an XLA op-level profile of the batched multistart solve (scan vs
Pallas DP) and print the top self-time ops — locates the in-situ 3 ms/outer-
iter gap that the isolated DP-step chain (dpstep_amortized.py) does not show.

Run on the TPU (one process at a time, CLAUDE.md):
    timeout 590 python benchmarks/multistart_trace.py [S] [nt] [which]
"""

import glob
import os
import sys

import numpy as np

from mioc_tpu.models import registry
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import multistart_solve_device
from mioc_tpu.utils.init import rand_func


def top_ops(logdir, n=25):
    """Per-op device self-times from the xplane proto directly (the
    tensorboard-plugin converter is broken in this image — dp_roofline.py
    uses the same parser)."""
    from dp_roofline import device_op_times  # same directory

    by_name, tot = device_op_times(logdir)
    print(f"  total device self time: {tot * 1e3:.1f} ms")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
    for name, (s, cnt) in rows[:n]:
        print(f"  {s * 1e3:9.3f} ms  {cnt:>6}x  {name[:86]}")


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    nt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    problem = sys.argv[4] if len(sys.argv) > 4 else "fishing"

    import jax

    print(f"platform: {jax.devices()[0].platform}, S={S}, nt={nt}, {problem}")
    spec = registry.get(problem)
    obj = spec.factory(nt=nt)
    par = TRMParameters(**spec.preset)
    x0s = np.stack([np.asarray(rand_func(obj, seed=s)) for s in range(S)])

    cases = [("scan", False), ("pallas", True)]
    if which != "both":
        cases = [c for c in cases if c[0] == which]
    for name, up in cases:
        multistart_solve_device(obj, par, x0s, use_pallas=up)  # compile+warm
        # Fresh dir per run (a reused dir serves a stale trace).
        logdir = f"/tmp/mioc_trace_{name}_{os.getpid()}"
        with jax.profiler.trace(logdir):
            multistart_solve_device(obj, par, x0s, use_pallas=up)
        print(f"== {name} ==")
        try:
            top_ops(logdir)
        except Exception as e:
            print("  (trace parse failed:", e, ")")


if __name__ == "__main__":
    main()
