#!/usr/bin/env python
"""Heat device TRM: speculative trial wave vs sequential inner loop on TPU.

Checks the round-4 claim end-to-end: with the dense PDE sweeps and decision
reductions running through batch-invariant fold trees (ops/detred.py), the
speculative wave's trajectory bit-matches the sequential device loop on f32
TPU — and measures the iteration-rate win from batching the trial sweeps.

Run detached (one TPU process at a time; no timeout wrapper — CLAUDE.md):
    nohup python benchmarks/heat_spec_tpu.py > /tmp/heat_spec.log 2>&1 &
"""

import sys
import time

import numpy as np

import jax

from mioc_tpu.models.heat import HeatObj
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import trm_solve_device
from mioc_tpu.utils.init import rand_func


def main():
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    print(f"platform={jax.devices()[0].platform} nt={nt}", flush=True)
    par = TRMParameters(beta=1e-3, p=2, delta0=2.0)

    # Objective constructed OUTSIDE the timing: re-running the FEM assembly
    # + operator upload inside the timed region polluted the round-4 rates
    # (same flaw as singletrm_rates.py — caught round 5).  The solve is
    # pure in x0, so reuse is exact.
    objs = {False: HeatObj(nt=nt), True: HeatObj(nt=nt)}

    def run(spec, seed):
        t0 = time.perf_counter()
        res = trm_solve_device(objs[spec], par, seed=seed, speculative=spec,
                               outer_chunk="auto")
        return res, time.perf_counter() - t0

    # Compile + warm on seed 0; trajectory comparison on the same start.
    seq0, _ = run(False, 0)
    spec0, _ = run(True, 0)
    eq_u = np.array_equal(np.asarray(seq0.u), np.asarray(spec0.u))
    eq_x = np.array_equal(np.asarray(seq0.x_final), np.asarray(spec0.x_final))
    eq_J = np.asarray(seq0.J).tobytes() == np.asarray(spec0.J).tobytes()
    print(f"trajectory bit-match: u={eq_u} x_final={eq_x} J={eq_J}", flush=True)
    print(f"  seq : it={int(seq0.iterations)} inner={int(seq0.inner_steps)} "
          f"J={float(seq0.J):.6f} conv={bool(seq0.converged)}", flush=True)
    print(f"  spec: it={int(spec0.iterations)} inner={int(spec0.inner_steps)} "
          f"J={float(spec0.J):.6f} conv={bool(spec0.converged)}", flush=True)

    # Warm timing on a fresh start (seed 1), best of 2.
    for name, spec in (("sequential", False), ("speculative", True)):
        best = float("inf")
        for _ in range(2):
            res, wall = run(spec, 1)
            best = min(best, wall)
        rate = int(res.iterations) / best
        print(f"{name}: {best:.2f} s warm, {int(res.iterations)} outer "
              f"({int(res.inner_steps)} inner) -> {rate:.1f} iters/s, "
              f"J={float(res.J):.6f}", flush=True)


if __name__ == "__main__":
    main()
