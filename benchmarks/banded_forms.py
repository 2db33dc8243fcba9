#!/usr/bin/env python
"""K-RHS banded matvec form shootout (8321-dof heat K operator).

The K-RHS sweep measures ~2.3× the single-vector sweep per application even
though both should be HBM-bound on the same 30 MB of operator blocks —
some einsum forms make XLA re-materialize an operand relayout.  This
script measures the candidate contractions directly (readback-slope over a
scan of R unique applications):

  single  y = einsum('rdij,rdj->ri')                    (the round-4 form)
  kri     y = einsum('rdij,krdj->kri')                  (native blocks)
  kri2    y = einsum('rkc,ric->kri'), blocks2 in-trace  (transpose inside)
  kri2p   same, blocks2 PRECOMPUTED outside the jit
  rik     y = einsum('rdij,rdjk->rik'), win transposed

Run on the TPU (ONE process at a time — CLAUDE.md):
    timeout 1800 python benchmarks/banded_forms.py [K]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mioc_tpu.models.heat import HeatObj, construct_mesh_hierarchy


def slope_time(fn, args, r1=8, r2=32):
    def many(reps):
        def body(acc, k):
            y = fn(*args, jnp.float32(k) * 1e-6)
            return acc + jnp.sum(y), None
        return jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0),
                                            jnp.arange(reps))[0])

    f1, f2 = many(r1), many(r2)
    float(f1()); float(f2())  # compile + warm
    t1 = min((lambda t0: (float(f1()), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(3))
    t2 = min((lambda t0: (float(f2()), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(3))
    return (t2 - t1) / (r2 - r1)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(f"platform={jax.devices()[0].platform} K={K}", flush=True)
    obj = HeatObj(nt=10, mesh_hierarchy=construct_mesh_hierarchy(refinements=5),
                  solver="mg", cg_iters=2, sparse_format="banded")
    spec = obj._Kspec
    blocks = obj._Kblk
    R, D, rb, cb = blocks.shape
    N = spec.ncols
    print(f"dofs={N} R={R} D={D} rb={rb} cb={cb} "
          f"blocks={blocks.size * 4 / 1e6:.1f} MB", flush=True)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    lo, hi = -min(spec.offsets), max(spec.offsets)

    def windows(xs_, eps):
        xs_ = xs_ + eps  # unique per rep: defeats CSE
        xpad = jnp.zeros((K, (R + lo + hi) * cb), jnp.float32)
        xpad = xpad.at[:, lo * cb: lo * cb + N].set(xs_)
        xb = xpad.reshape(K, R + lo + hi, cb)
        return jnp.stack([xb[:, lo + d: lo + d + R] for d in spec.offsets],
                         axis=2)  # (K, R, D, cb)

    blocks2 = jnp.asarray(
        np.asarray(blocks).transpose(0, 2, 1, 3).reshape(R, rb, D * cb))

    forms = {
        "single": lambda b, x, e: jnp.einsum(
            "rdij,rdj->ri", b, windows(x, e)[0]),
        "kri": lambda b, x, e: jnp.einsum("rdij,krdj->kri", b, windows(x, e)),
        "kri2": lambda b, x, e: jnp.einsum(
            "rkc,ric->kri",
            windows(x, e).transpose(1, 0, 2, 3).reshape(R, K, D * cb),
            b.transpose(0, 2, 1, 3).reshape(R, rb, D * cb)),
        "rik": lambda b, x, e: jnp.einsum(
            "rdij,rdjk->rik", b, windows(x, e).transpose(1, 2, 3, 0)),
    }
    for name, f in forms.items():
        t = slope_time(f, (blocks, xs))
        print(f"{name:8s}: {t * 1e6:8.1f} us/apply", flush=True)
    t = slope_time(lambda b2, x, e: jnp.einsum(
        "rkc,ric->kri",
        windows(x, e).transpose(1, 0, 2, 3).reshape(R, K, D * cb), b2),
        (blocks2, xs))
    print(f"{'kri2p':8s}: {t * 1e6:8.1f} us/apply (blocks2 precomputed)",
          flush=True)
    hbm = blocks.size * 4 / 819e9
    print(f"HBM bound (blocks stream): {hbm * 1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
