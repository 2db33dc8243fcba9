#!/usr/bin/env python
"""Op-level device profile of the SINGLE-start device TRM solve (fishing) —
locates where the ~13 ms/outer-iteration goes (the weakest bench ratio:
36 iters/s on TPU vs 65 iters/s host-CPU, only 1.8×).

Run on the TPU (one process at a time; NO hard timeout wrapper — a kill
mid-claim can wedge the tunnel, CLAUDE.md — run detached and poll the log):
    nohup python benchmarks/singletrm_trace.py [nt] > /tmp/singletrm.log 2>&1 &
"""

import sys

import numpy as np

from multistart_trace import top_ops  # noqa: E402  (same directory)

from mioc_tpu.models import registry
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import trm_solve_device


def main():
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    import jax

    print(f"platform: {jax.devices()[0].platform}, nt={nt}")
    spec = registry.get(sys.argv[2] if len(sys.argv) > 2 else "fishing")
    obj = spec.factory(nt=nt)
    par = TRMParameters(**spec.preset)

    res = trm_solve_device(obj, par, seed=1)  # compile + warm
    print(f"warm solve: J={float(res.J):.6f}, iters={int(res.iterations)}, "
          f"converged={bool(res.converged)}")
    # Fresh dir per run: the parser globs the first trace file, and a
    # reused dir serves a STALE one (observed: identical readings).
    import os as _os
    logdir = f"/tmp/mioc_trace_single_{_os.getpid()}"
    with jax.profiler.trace(logdir):
        res = trm_solve_device(obj, par, seed=1)
        _ = float(res.J)  # readback forces completion inside the trace
    print(f"== single-start device TRM (fishing nt={nt}, "
          f"{int(res.iterations)} outer iters) ==")
    top_ops(logdir, n=30)


if __name__ == "__main__":
    main()
