#!/usr/bin/env python
"""Conv MXU precision trade (VERDICT r4 item 3 / r5 item 3).

Round 4's on-chip FD tests caught the TPU default single-bf16-pass matmul
costing ~1e-3 relative on the conv objective; the fix pinned "highest"
(6 passes) and cost the device TRM 57.5 → 46.2 iters/s.  This script
measures the intermediate "float32" (3-pass) level against the SAME
tolerances the f32 TPU suite applies (tests/test_objectives.py with
tests/_precision.py knobs) plus the device-TRM rate, for both precisions.

Run on the TPU (ONE process at a time — CLAUDE.md):
    timeout 2400 python benchmarks/conv_precision.py
"""

import time

import jax.numpy as jnp
import numpy as np

from mioc_tpu.models import ConvObj
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import trm_solve_device
from mioc_tpu.utils.init import rand_func

FD_T, FD_RTOL = 1e-2, 2e-2  # the f32 suite's knobs (tests/_precision.py)


def fd_checks(precision):
    """The two on-chip conv derivative checks, f32 form."""
    obj = ConvObj(nt=256, matmul_precision=precision)
    x = np.ones((obj.nt, 1))
    obj.x = jnp.asarray(x)
    obj.eval_f_()
    obj.eval_df_()
    h = np.random.default_rng(0).normal(size=x.shape)
    dfh = float(jnp.sum(obj.df * h))
    fd = (obj.eval_f(x + FD_T * h) - obj.eval_f(x - FD_T * h)) / (2 * FD_T)
    grad_err = abs(fd - dfh) / max(1.0, abs(dfh))

    obj2 = ConvObj(nt=128, matmul_precision=precision)
    x2 = np.ones((obj2.nt, 1))
    obj2.x = jnp.asarray(x2)
    obj2.eval_f_()
    obj2.eval_df_()
    h2 = np.random.default_rng(1).normal(size=x2.shape)
    dfh2 = float(jnp.sum(obj2.df * h2))
    t = 1e-1
    fd2 = (obj2.eval_f(x2 + t * h2) - obj2.eval_f(x2 - t * h2)) / (2 * t)
    quad_err = abs(fd2 - dfh2) / abs(dfh2)
    return grad_err, quad_err


def trm_rate(precision, nt=1024):
    obj = ConvObj(nt=nt, matmul_precision=precision)
    par = TRMParameters(beta=1e-4, p=1, delta0=0.125)
    trm_solve_device(obj, par, seed=0, outer_chunk=None)  # compile + warm
    t0 = time.perf_counter()
    res = trm_solve_device(obj, par, seed=1, outer_chunk=None)
    wall = time.perf_counter() - t0
    return (int(res.iterations) / wall, float(res.J), bool(res.converged),
            np.asarray(res.u))


def main():
    import jax

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    out = {}
    for prec in ("highest", "float32"):
        ge, qe = fd_checks(prec)
        ok = ge < FD_RTOL and qe < 2e-4
        print(f"{prec:8s}: FD grad err {ge:.2e} (tol {FD_RTOL}), quadratic "
              f"err {qe:.2e} (tol 2e-4) -> {'PASS' if ok else 'FAIL'}",
              flush=True)
        rate, J, conv, u = trm_rate(prec)
        out[prec] = u
        print(f"{prec:8s}: device TRM nt=1024 {rate:.1f} iters/s, J={J:.8f},"
              f" converged={conv}", flush=True)
    same = np.array_equal(out["highest"], out["float32"])
    print(f"controls identical across precisions: {same}", flush=True)


if __name__ == "__main__":
    main()
