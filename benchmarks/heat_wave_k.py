#!/usr/bin/env python
"""Wave trial-count economics for dense heat (VERDICT r4 item 8).

The speculative wave evaluates all K_spec trials every outer iteration while
the sequential loop averages ~5 — could a two-stage wave (2 trials, then the
rest only when needed) win?  On the MXU the answer is shape math: the trial
sweep's per-step matmul is (K, N) @ (N, N) and K ≤ 8 pads to one 8-sublane
tile, so K=2 and K=7 cost the SAME pass — this script measures exactly that
(the batched forward at K = 2 / 4 / 7 with value readback), plus the
batched-vs-sequential sweep total per outer iteration.

Run on the TPU (ONE process at a time — CLAUDE.md):
    timeout 1800 python benchmarks/heat_wave_k.py [nt]
"""

import sys
import time

import jax.numpy as jnp
import numpy as np

import jax

from mioc_tpu.models.heat import HeatObj
from mioc_tpu.utils.init import rand_func


def main():
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    print(f"platform={jax.devices()[0].platform} nt={nt}", flush=True)
    obj = HeatObj(nt=nt)
    ops = obj._sweep_ops()

    times = {}
    for K in (2, 4, 7):
        us = jnp.stack([jnp.asarray(rand_func(obj, seed=s), obj.dtype)
                        for s in range(K)])
        f, _ = obj._forward_batch_with(us, ops)
        float(f[0])  # compile + warm, readback forces completion
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            f, _ = obj._forward_batch_with(us, ops)
            float(f[0])
            best = min(best, time.perf_counter() - t0)
        times[K] = best
        print(f"batched forward K={K}: {best * 1e3:7.2f} ms "
              f"({best * 1e3 / K:6.2f} ms/trial)", flush=True)

    k2, k7 = times[2], times[7]
    print(f"K=7 / K=2 = {k7 / k2:.3f} — a two-stage wave could save at most "
          f"{max(0.0, (k7 - k2)) * 1e3:.2f} ms per wave-exiting-early outer "
          f"iteration (vs its extra select/cond machinery)", flush=True)
    # Sequential-equivalent: ~5 single evaluations, each a duplicated 2-row
    # batch of the same function.
    print(f"sequential-equivalent 5 x K=2: {5 * k2 * 1e3:7.2f} ms vs one "
          f"full wave {k7 * 1e3:7.2f} ms -> batch amortization "
          f"{5 * k2 / k7:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
