#!/usr/bin/env python
"""Probe: are vmapped PDE sweeps bit-identical per lane on this backend?

The speculative trial wave defaults OFF for PDE objectives because a vmapped
dense matvec becomes a batched matmul whose f32 accumulation order MIGHT
differ from the single sweep (trm_device.py round-3 caveat).  Whether it
actually differs is a property of the XLA lowering on the target backend —
this script measures it instead of assuming: for the heat model (dense
S⁻¹ sweeps at "highest" matmul precision) it compares, bit for bit,

  * forward sweep: fval and every state column, single vs vmapped lane;
  * adjoint sweep: df and λ;
  * the TRM decision reductions: per-trial ``int_val``/``TV`` in the
    batched shapes trm_device's speculative body uses vs the sequential
    scalar reductions.

Run on the TPU (one process at a time; detached — a timeout kill mid-claim
can wedge the tunnel, CLAUDE.md):
    nohup python benchmarks/pde_batch_bitexact.py > /tmp/pde_bitexact.log 2>&1 &
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from mioc_tpu.models.heat import HeatObj
from mioc_tpu.ops.tv import _tv
from mioc_tpu.utils.init import rand_func


def bits(a):
    return np.asarray(a).view(np.uint32 if np.asarray(a).dtype == np.float32
                              else np.uint64)


def main():
    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(f"platform={jax.devices()[0].platform} nt={nt} K={K}", flush=True)

    obj = HeatObj(nt=nt)
    ops = obj._sweep_ops()
    us = jnp.stack([jnp.asarray(rand_func(obj, seed=s), obj.dtype)
                    for s in range(K)])

    fwd = lambda u: obj._forward_with(u, ops)
    f_seq, ys_seq = zip(*[fwd(us[k]) for k in range(K)])
    f_bat, ys_bat = jax.jit(jax.vmap(fwd))(us)
    f_bat.block_until_ready()

    ok_f = all(bits(f_seq[k]) == bits(f_bat[k]) for k in range(K))
    ok_ys = all(np.array_equal(bits(ys_seq[k]), bits(ys_bat[k]))
                for k in range(K))
    print(f"forward: fval bitexact={ok_f}  states bitexact={ok_ys}", flush=True)
    if not ok_f:
        d = [float(abs(np.asarray(f_seq[k]) - np.asarray(f_bat[k])))
             for k in range(K)]
        print(f"  fval |diff| per lane: {d}")
    if not ok_ys:
        for k in range(K):
            d = np.abs(np.asarray(ys_seq[k]) - np.asarray(ys_bat[k]))
            print(f"  lane {k}: max state |diff| {d.max():.3e} "
                  f"({(bits(ys_seq[k]) != bits(ys_bat[k])).mean()*100:.2f}% "
                  f"of entries differ)")

    adj = lambda u, ys: obj._adjoint_with(u, ys, ops)
    df_seq = [adj(us[k], ys_seq[k])[0] for k in range(K)]
    df_bat, _ = jax.jit(jax.vmap(adj))(us, jnp.stack(ys_seq))
    ok_df = all(np.array_equal(bits(df_seq[k]), bits(df_bat[k]))
                for k in range(K))
    print(f"adjoint: df bitexact={ok_df}", flush=True)

    # TRM decision reductions (the EXACT forms trm_device's sequential body
    # and speculative wave use — both detsum_all fold trees since round 4).
    from mioc_tpu.ops.detred import detsum_all

    grad = df_seq[0]
    u_old = us[0]
    dt = obj.tau
    iv_seq = [float(jax.jit(lambda g, uo, uu: dt * detsum_all(g * (uo - uu)))(
        grad, u_old, us[k])) for k in range(K)]
    iv_bat = np.asarray(jax.jit(
        lambda g, uo, uu: dt * jax.vmap(
            lambda one: detsum_all(g * (uo - one)))(uu))(grad, u_old, us))
    tv_seq = [float(_tv(us[k], 2.0)) for k in range(K)]
    tv_bat = np.asarray(jax.jit(jax.vmap(lambda uu: _tv(uu, 2.0)))(us))
    ok_iv = all(np.float32(iv_seq[k]) == np.float32(iv_bat[k]) if
                iv_bat.dtype == np.float32 else iv_seq[k] == iv_bat[k]
                for k in range(K))
    ok_tv = all(np.asarray(tv_seq[k], tv_bat.dtype) == tv_bat[k]
                for k in range(K))
    print(f"reductions: int_val bitexact={ok_iv}  tv bitexact={ok_tv}",
          flush=True)

    verdict = ok_f and ok_ys and ok_df and ok_iv and ok_tv
    print(f"VERDICT: batched heat sweeps bitexact={verdict}", flush=True)


if __name__ == "__main__":
    main()
