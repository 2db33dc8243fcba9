"""Probe the fused-multistart VMEM-pinning residual (VERDICT r2 item 2).

Round-2 op profiles showed the ODE sweeps' tiny f32[L] loop-invariant
constants (fishing's ``v1``/``v2``) losing their VMEM (S(1)) pinning when the
jitted module also contains the Pallas DP custom calls — ~0.50 ms/sweep vs
0.16 ms in the scan-only module.  This script measures ×32 fishing multistart
ms/solve for candidate fixes, warm best-of-3 each:

  A. baseline           — current LVMObj (v1/v2 as f32[3] literal buffers);
  B. immediates         — dot products unrolled into Python-float scalar
                          immediates (no constant buffers in the scan body);

and checks B's controls bit-match A's.

Run on the TPU (sole tunnel client):  timeout 590 python benchmarks/multistart_pinning.py
"""

import time

import jax.numpy as jnp
import numpy as np

from mioc_tpu.models import LVMObj
from mioc_tpu.solvers.trm import TRMParameters
from mioc_tpu.solvers.trm_device import multistart_solve_device
from mioc_tpu.utils.init import rand_func


class LVMObjImmediate(LVMObj):
    """Fishing dynamics with the v1/v2 dots unrolled to scalar immediates."""

    def _dotv(self, u, v):
        return sum(float(c) * u[m] for m, c in enumerate(np.asarray(v)))

    def F(self, y, u, i):
        cv1 = self._dotv(u, self.v1)
        cv2 = self._dotv(u, self.v2)
        return jnp.stack(
            [
                y[0] * (self.alpha - self.beta * y[1] - self.c1 * cv1),
                y[1] * (-self.gamma + self.delta * y[0] - self.c2 * cv2),
            ]
        )

    def Fy(self, y, u, i):
        cv1 = self._dotv(u, self.v1)
        cv2 = self._dotv(u, self.v2)
        return jnp.array(
            [
                [self.alpha - self.beta * y[1] - self.c1 * cv1, -self.beta * y[0]],
                [self.delta * y[1], -self.gamma + self.delta * y[0] - self.c2 * cv2],
            ]
        )


def run(obj, x0s, par, label, reps=3):
    res = multistart_solve_device(obj, par, x0s)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        res = multistart_solve_device(obj, par, x0s)
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / x0s.shape[0]
    print(f"{label:12s}: {ms:7.2f} ms/solve  "
          f"(best J={float(np.min(np.asarray(res.J))):.6f}, "
          f"{int(np.sum(np.asarray(res.converged)))}/{x0s.shape[0]} conv)")
    return ms, res


def main():
    S, nt = 32, 1024
    par = TRMParameters(beta=1e-4, delta0=2.0, p=np.inf)
    base = LVMObj(nt=nt)
    x0s = np.stack([np.asarray(rand_func(base, seed=s)) for s in range(S)])

    ms_a, res_a = run(base, x0s, par, "A baseline")
    ms_b, res_b = run(LVMObjImmediate(nt=nt), x0s, par, "B immediates")

    same = np.array_equal(np.asarray(res_a.u), np.asarray(res_b.u))
    print(f"controls bit-match: {same};  B speedup vs A: {ms_a / ms_b:.2f}x")


if __name__ == "__main__":
    main()
