"""Scenario/multistart batch parallelism.

The reference solves one instance on one CPU core; the TPU-native framework
treats random restarts and problem scenarios as a batch axis, sharded across
the device mesh.  Two levels are provided:

* :func:`make_ode_trm_step` — a jitted, mesh-sharded "training step": for a
  batch of current controls, compute the discrete-adjoint gradient, build the
  Bellman tables, extract the DP minimizer, and evaluate the trial objective —
  i.e. one full TRM inner step for every scenario at once (the expensive,
  device-resident part of the outer loop; accept/halve logic remains host-side
  per scenario).
* :func:`multistart_solve` — full TRM solves from ``n_starts`` random
  admissible controls, returning the best result (the reference's golden value
  is start-dependent; multistart recovers the best stationary point).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.bellman import backtrack, build_tables, max_budget_use, stage_tables
from ..ops.levels import jump_cost_table
from ..ops.tv import tv_p

__all__ = ["make_ode_trm_step", "multistart_solve"]


def make_ode_trm_step(obj, *, beta: float, p, delta0: float, mesh=None,
                      compat_pinf: bool = False):
    """Build ``step(u_batch) -> (u_new, J_new, J_model)`` for an ODE (or any
    Lazy) objective with compiled ``_forward``/``_adjoint`` sweeps.

    ``u_batch`` is ``(S, nt, nx)``; with a mesh, inputs/outputs are sharded
    over its ``batch`` axis (scenario data parallelism over ICI).  When the
    mesh also has a ``level`` axis of size > 1, the DP contraction inside
    each batch shard is additionally partitioned over the successor axis with
    all_gather-min combines (:mod:`.shard_dp`) — composed batch × level
    parallelism in one jitted step.  ``J_model[s]`` is the DP's model
    objective τ·∇f·u + β·TV (per scenario).
    """
    adm = obj.admissible
    # numpy closures: baked as jit literals (device-array consts degrade the
    # axon runtime's dispatch latency, BASELINE_SELF.md).
    levels = np.asarray(adm.levels)
    jump = np.asarray(
        jump_cost_table(adm.levels, p, beta=beta, compat_pinf=compat_pinf)
    )
    smax = max_budget_use(adm.levels)
    B = int(np.floor(delta0 / obj.tau))
    tau = obj.tau

    sweep_ops = obj._sweep_ops()
    lev = int(mesh.shape.get("level", 1)) if mesh is not None else 1

    def one(u, ops, dp_build):
        f_old, ys = obj._forward_with(u, ops)
        grad, _ = obj._adjoint_with(u, ys, ops)
        stage, btilde = stage_tables(grad, u, levels, tau)
        U, phi0, btilde = dp_build(stage, btilde)
        u_new, idx = backtrack(U, phi0, btilde, levels, jnp.int32(B))
        f_new, _ = obj._forward_with(u_new, ops)
        model = tau * jnp.sum(grad * u_new) + beta * tv_p(u_new, p)
        return u_new, f_new, model

    if lev > 1:
        from jax import shard_map

        from .shard_dp import dp_body, pad_level_axis

        def body(u_blk, jump_blk, ops):
            def one_sharded(u):
                def dp_build(stage, btilde):
                    stage_p, btilde_p, _, _ = pad_level_axis(
                        stage, btilde, jnp.asarray(jump), lev, B
                    )
                    U, phi0 = dp_body(stage_p, btilde_p, jump_blk, B)
                    return U, phi0, btilde_p

                return one(u, ops, dp_build)

            return jax.vmap(one_sharded)(u_blk)

        jump_pad = pad_level_axis(
            jnp.zeros((1, len(levels))), jnp.zeros((1, len(levels)), jnp.int32),
            jnp.asarray(jump), lev, B,
        )[2]
        sh, rep = P("batch"), P()
        ops_specs = jax.tree_util.tree_map(lambda _: rep, sweep_ops)
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(sh, P(None, "level"), ops_specs),
            out_specs=(sh, sh, sh),
            check_vma=False,
        )
        step_jit = jax.jit(fn)

        def step(u_batch):
            return step_jit(u_batch, jump_pad, sweep_ops)

        return step

    def dp_build(stage, btilde):
        U, phi0 = build_tables(stage, btilde, jump, B, smax)
        return U, phi0, btilde

    vm = jax.vmap(lambda u, ops: one(u, ops, dp_build), in_axes=(0, None))
    if mesh is not None:
        sh = NamedSharding(mesh, P("batch"))
        rep = NamedSharding(mesh, P())
        ops_sh = jax.tree_util.tree_map(lambda _: rep, sweep_ops)
        step_jit = jax.jit(vm, in_shardings=(sh, ops_sh), out_shardings=(sh, sh, sh))
    else:
        step_jit = jax.jit(vm)

    def step(u_batch):
        return step_jit(u_batch, sweep_ops)

    return step


def multistart_solve(obj_factory, n_starts: int, par=None, seed: int = 0,
                     x0s: Optional[np.ndarray] = None):
    """Run full TRM solves from ``n_starts`` random starts; return
    ``(best_result, all_results)``."""
    from ..solvers.trm import TRMParameters, trm_solve
    from ..utils.init import rand_func

    par = par or TRMParameters()
    results = []
    for s in range(n_starts):
        obj = obj_factory() if callable(obj_factory) else obj_factory
        x0 = x0s[s] if x0s is not None else rand_func(obj, seed=seed + s)
        results.append(trm_solve(obj, par, x0=x0))
    best = min(results, key=lambda r: r.J)
    return best, results
