#!/usr/bin/env python
"""Large-mesh heat (banded MG-CG engine) on TPU: K-RHS amortization + wave.

Round-4 state: the 8321-dof heat solve paid its ~0.3 s HBM-bound banded
sweep PER sequential trial (~1.5 s/outer, BASELINE_SELF.md).  Round 5's
K-RHS banded engine (banded_matvec_rows / cg_solve_rows /
mg_apply_banded_rows) streams the operator blocks once for all K
right-hand sides, so the speculative trial wave evaluates the whole
halving schedule for ~one sweep's traffic.  This script verifies the
on-chip bit-invariance contract and measures the end-to-end win.

Stages (each prints as it completes; run detached, no timeout wrapper —
a mid-claim kill can wedge the tunnel, CLAUDE.md):
    nohup python benchmarks/heat_banded_tpu.py > /tmp/heat_banded.log 2>&1 &

  1. K-row bit-invariance probe: forward_batch_banded rows (K=4) vs the
     duplicated-2-row single forward — must be BIT-equal on chip.
  2. Sweep amortization: warm time of the K-RHS forward at K=2 vs K=8
     (value readback), showing the per-RHS cost collapse.
  3. Device TRM at 8321 dofs, nt=200: sequential vs speculative wave,
     outer_chunk=25 (deadline-safe segmenting), same seed — trajectory
     bit-match + per-outer-iteration time.
"""

import sys
import time

import jax.numpy as jnp
import numpy as np

import jax

from mioc_tpu.models.heat import HeatObj, construct_mesh_hierarchy
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import trm_solve_device
from mioc_tpu.utils.init import rand_func


def make(nt, refinements, cg_iters):
    return HeatObj(nt=nt,
                   mesh_hierarchy=construct_mesh_hierarchy(
                       refinements=refinements),
                   solver="mg", cg_iters=cg_iters, sparse_format="banded")


def main():
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    refinements = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cg_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    print(f"platform={jax.devices()[0].platform} nt={nt} "
          f"refinements={refinements} cg_iters={cg_iters}", flush=True)

    obj = make(nt, refinements, cg_iters)
    print(f"dofs={obj.Nglobal_dofs}", flush=True)
    ops = obj._sweep_ops()

    # -- 1. bit-invariance probe ------------------------------------------
    us = jnp.stack([jnp.asarray(rand_func(obj, seed=s), obj.dtype)
                    for s in range(4)])
    fb, yb = obj._forward_batch_with(us, ops)
    fb, yb = np.asarray(fb), np.asarray(yb)
    ok = True
    for k in range(4):  # yb is time-major: batch axis second
        f1, y1 = obj._forward_with(us[k], ops)
        ok &= (np.asarray(f1).tobytes() == fb[k].tobytes()
               and np.array_equal(np.asarray(y1), yb[:, k]))
    print(f"K-row bit-invariance (K=4 vs duplicated-2-row singles): {ok}",
          flush=True)

    # -- 2. sweep amortization --------------------------------------------
    for K in (2, 8):
        usk = jnp.stack([jnp.asarray(rand_func(obj, seed=s), obj.dtype)
                         for s in range(K)])
        f, _ = obj._forward_batch_with(usk, ops)
        float(f[0])  # compile + warm with readback
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            f, _ = obj._forward_batch_with(usk, ops)
            float(f[0])
            best = min(best, time.perf_counter() - t0)
        print(f"K-RHS forward sweep K={K}: {best * 1e3:8.1f} ms "
              f"({best * 1e3 / K:6.1f} ms/RHS)", flush=True)

    # -- 3. device TRM: sequential vs wave --------------------------------
    # outer_chunk=10: an 8321-dof outer iteration now costs up to ~1.5-3 s
    # (K-RHS sweeps), and a 25-iteration dispatch exceeded the axon
    # execution deadline and CRASHED the worker (first round-5 attempt).
    def run(spec):
        o = make(nt, refinements, cg_iters)
        t0 = time.perf_counter()
        res = trm_solve_device(o, TRMParameters(beta=1e-3, p=2, delta0=2.0),
                               seed=1, speculative=spec, outer_chunk=10)
        return res, time.perf_counter() - t0

    results = {}
    for name, spec in (("wave", True), ("sequential", False)):
        res, cold = run(spec)       # includes compile
        res, warm = run(spec)       # warm
        results[name] = res
        per_outer = warm / max(1, int(res.iterations))
        print(f"{name:10s}: warm {warm:7.1f} s ({cold:7.1f} s cold), "
              f"{int(res.iterations)} outer / {int(res.inner_steps)} inner "
              f"-> {per_outer:6.2f} s/outer, J={float(res.J):.6f}, "
              f"conv={bool(res.converged)}", flush=True)
    equ = np.array_equal(np.asarray(results['sequential'].u),
                         np.asarray(results['wave'].u))
    print(f"trajectory bit-match (u): {equ}", flush=True)


if __name__ == "__main__":
    main()
