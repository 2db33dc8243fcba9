#!/usr/bin/env python
"""Warm single-solve device-TRM iteration rates, speculative vs sequential.

Round-4 follow-up to benchmarks/singletrm_trace.py: the speculative wave now
chases all halving trials with the trial-wave kernel (one shared U-plane
stream instead of a ×K broadcast of the tables) and conv evaluates through
the batch-invariant MXU objective, so both fishing and conv run the wave by
default.  Timing is wall clock around a full solve with a value readback at
the end (honest through the axon tunnel).

Run detached (one TPU process at a time — CLAUDE.md):
    nohup python benchmarks/singletrm_rates.py > /tmp/single_rates.log 2>&1 &
"""

import time

import numpy as np

import jax

from mioc_tpu.models import registry
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import trm_solve_device


def measure(problem, nt, spec):
    reg = registry.get(problem)
    par = TRMParameters(**reg.preset)
    # Objective constructed OUTSIDE the timed region: factory() inside the
    # timing (the round-4 form of this script) re-built the model and
    # re-uploaded its operator matrices through the tunnel per rep — for
    # conv that is a 4.2 MB Toeplitz upload costing ~1.4 s, which DOMINATED
    # the measured "rate" (round-4's conv 46.2 iters/s was really ~920;
    # caught in round 5 when two scripts disagreed 20×).  The solve is pure
    # in x0, so reuse is exact.
    obj = reg.factory(nt=nt)
    trm_solve_device(obj, par, seed=0, speculative=spec,
                     outer_chunk=None)  # compile + warm
    best, res = float("inf"), None
    for _ in range(3):
        t0 = time.perf_counter()
        res = trm_solve_device(obj, par, seed=1,
                               speculative=spec, outer_chunk=None)
        best = min(best, time.perf_counter() - t0)
    return best, res


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for problem, nt in (("fishing", 1024), ("convolution", 1024)):
        out = {}
        for spec in (False, True):
            wall, res = measure(problem, nt, spec)
            rate = int(res.iterations) / wall
            out[spec] = (wall, res)
            print(f"{problem} nt={nt} spec={spec}: {wall*1e3:.1f} ms, "
                  f"{int(res.iterations)} outer ({int(res.inner_steps)} "
                  f"inner) -> {rate:.1f} iters/s, J={float(res.J):.6f}, "
                  f"conv={bool(res.converged)}", flush=True)
        eq = np.array_equal(np.asarray(out[False][1].u),
                            np.asarray(out[True][1].u))
        print(f"{problem}: speculative u bit-matches sequential: {eq}",
              flush=True)


if __name__ == "__main__":
    main()
