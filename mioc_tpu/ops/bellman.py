"""Bellman dynamic program for the TV trust-region subproblem (XLA scan path).

This is the TPU-native re-design of the reference's hot loop
(``bellman_TRM!`` at ``/root/reference/HelpFunctions.jl:20-83`` and
``eval_u_TRM!`` at ``:98-124``).  The subproblem solved exactly is

    min_u  Σ_i τ·∇f_i·u_i  +  β·TV_p(u)      s.t.  Σ_i ‖u_i − u_old_i‖₁ ≤ B,
                                                    u_i ∈ {ν_0, …, ν_{L−1}}

over piecewise-constant controls on the time grid.  Instead of the reference's
four nested Julia loops over ``(i, l, j, b)``, each backward time step is a
**min-plus (tropical) contraction with a budget shift**, vectorized over the
whole ``(level-combination l, budget b)`` plane and scanned over time:

    tmp[l, b]  = min_j ( Φ_{i+1}[j, b] + jump[l, j] )           (tropical matvec)
    Φ_i[l, b]  = stage[i, l] + tmp[l, b − b̃[i, l]]              (budget shift)
                 (entries with b < b̃[i, l] are +inf)

TPU layout notes:
  * ``Φ`` is stored ``(L, B+1)`` — the budget axis (the long one) rides the
    128-wide vector lanes; ``L`` sits on sublanes.
  * The data-dependent budget shift is NOT a gather: admissible budget uses
    ``b̃`` are bounded by ``smax = max_{a,b} ‖ν_a − ν_b‖₁`` (both ``u_old`` and
    the DP iterates are admissible combinations), so the shift is a select
    over ``smax+1`` static ``jnp.roll``s — cheap lane rotations instead of a
    per-element gather.

Semantics preserved from the reference:
  * the budget axis tracks the EXACT accumulated L¹ deviation from ``u_old``
    (terminal layer seeds only ``b = b̃``, ``HelpFunctions.jl:40-42``);
  * ``Φ`` is double-buffered over time — here simply the scan carry;
  * ``U[k, l, b]`` stores the argmin successor combination at time ``k+1``
    given combination ``l`` at time ``k`` (the reference stores full index
    tuples; we store the flat combination index, int32);
  * argmin tie-breaking: first minimal ``j`` in enumeration order (the
    reference's strict-improvement update keeps the earliest ``j``), and the
    backtrack seed argmin scans ``b`` fastest then ``l`` (Julia column-major
    ``argmin``, ``HelpFunctions.jl:106``);
  * budget-halving reuse: :func:`backtrack` takes ``B_new`` as a *traced*
    argument so a halved trust region re-extracts the path from the same
    tables with no DP rebuild and no recompilation (``multi-trust.jl:108-110``).

Shapes are time-major: ``grad``/``u_old`` are ``(nt, M)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "stage_tables",
    "max_budget_use",
    "build_tables",
    "backtrack",
    "dp_solve",
]

_INF = jnp.inf


@jax.jit
def stage_tables(grad, u_old, levels, tau):
    """Per-(time, combination) stage cost and budget use.

    stage[i, l]  = τ · ∇f_i · ν_l          (``HelpFunctions.jl:34-36, 52-56``)
    btilde[i, l] = ‖ν_l − u_old_i‖₁        (integer, ``HelpFunctions.jl:37, 57``)
    """
    levels = jnp.asarray(levels, dtype=grad.dtype)
    stage = tau * (grad @ levels.T)  # (nt, L)
    btilde = jnp.round(
        jnp.abs(levels[None, :, :] - u_old[:, None, :]).sum(-1)
    ).astype(jnp.int32)  # (nt, L)
    return stage, btilde


def max_budget_use(levels) -> int:
    """Static bound on the per-step budget use: the L¹ diameter of the
    admissible set (both ``u_old`` and all DP iterates are admissible rows)."""
    levels = np.asarray(levels)
    d = np.abs(levels[None, :, :] - levels[:, None, :]).sum(-1)
    return int(round(d.max())) if d.size else 0


def _shift_select(btilde_i, arr, smax, fill):
    """``out[l, b] = arr[l, b − b̃_l]`` (entries ``b < b̃_l`` get ``fill``),
    realized as a select over the ``smax+1`` possible static lane rotations."""
    L, B1 = arr.shape
    out = jnp.full_like(arr, fill)
    b_lane = jax.lax.broadcasted_iota(jnp.int32, (1, B1), 1)
    for s in range(smax + 1):
        rolled = jnp.roll(arr, s, axis=-1) if s else arr
        cand = jnp.where(b_lane >= s, rolled, fill)
        out = jnp.where(btilde_i[:, None] == s, cand, out)
    return out


@partial(jax.jit, static_argnames=("B", "smax", "unroll"))
def build_tables(stage, btilde, jump_cost, B: int, smax: int = None, unroll: int = 4):
    """Backward value recursion; returns ``(U, phi0)``.

    U:    (nt-1, L, B+1) int32 argmin-successor table.
    phi0: (L, B+1) value table at the first time step (the only Φ slice the
          backtrack needs — the reference's ``Φ[…, 1]``).
    smax: static bound on per-step budget use (default: conservative ``B``,
          pass :func:`max_budget_use` of the level set for speed).
    """
    nt, L = stage.shape
    if smax is None:
        smax = B
    smax = min(smax, B)
    b_lane = jax.lax.broadcasted_iota(jnp.int32, (1, B + 1), 1)

    # Terminal layer i = nt-1: exact-budget seed (HelpFunctions.jl:29-43).
    phi_T = jnp.where(
        b_lane == btilde[-1][:, None], stage[-1][:, None], _INF
    )  # (L, B+1)

    def step(phi, xs):
        stage_i, btilde_i = xs  # (L,), (L,)
        # Tropical contraction over successors j; first-minimal-j argmin.
        tot = phi[None, :, :] + jump_cost[:, :, None]  # (l, j, b)
        val = jnp.min(tot, axis=1)
        arg = jnp.argmin(tot, axis=1).astype(jnp.int32)
        # Budget shift b → b + b̃_l as static lane rotations.  U stores the
        # POST-shift argmin plane: a pre-shift table was measured (round 5)
        # to save ~⅓ of the build's shift chain but to SERIALIZE the chase's
        # pointer recurrence (the budget decrement moves onto the lookup's
        # critical cycle — conv chase +75%), and chases outnumber builds
        # ~7:1 in the TRM loop.  Post-shift keeps the decrement off the
        # chase's recurrence at the build's expense.
        new_phi = stage_i[:, None] + _shift_select(btilde_i, val, smax, _INF)
        U_i = _shift_select(btilde_i, arg, smax, jnp.int32(0))
        return new_phi, U_i

    # Sweep i = nt-2 … 0; scan emits rows in sweep order, so flip to get
    # U[k] = transition table for time k → k+1.
    phi0, U_rev = lax.scan(
        step, phi_T, (stage[:-1][::-1], btilde[:-1][::-1]), unroll=unroll
    )
    return U_rev[::-1], phi0


@jax.jit
def backtrack(U, phi0, btilde, levels, B_new):
    """Extract the optimal control from the DP tables (``eval_u_TRM!``).

    ``B_new`` is traced: a halved trust region only masks the seed argmin to
    budgets ``≤ B_new`` and re-chases the same ``U``.  Returns
    ``(u, level_idx)`` with ``u`` of shape ``(nt, M)``.
    """
    L, B1 = phi0.shape
    levels = jnp.asarray(levels, dtype=phi0.dtype)

    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, B1), 1) <= B_new, phi0, _INF
    )
    # Julia argmin is column-major: b varies fastest, then l (HelpFunctions.jl:106);
    # row-major argmin over (L, B+1) scans exactly that order.
    flat_idx = jnp.argmin(masked.reshape(-1))
    l0 = (flat_idx // B1).astype(jnp.int32)
    b0 = (flat_idx % B1).astype(jnp.int32)

    def chase(carry, xs):
        l, b = carry
        U_k, btilde_k = xs
        # astype: the fused build may deliver U as int8 (argmin indices fit
        # i8 for L ≤ 127 — 4× less HBM traffic, ops/bellman_pallas.py); the
        # scan carry stays i32 either way.
        nl = U_k[l, b].astype(jnp.int32)
        nb = b - btilde_k[l]  # decrement AFTER lookup (HelpFunctions.jl:115-122)
        return (nl, nb), nl

    _, ls = lax.scan(chase, (l0, b0), (U, btilde[:-1]))
    level_idx = jnp.concatenate([l0[None], ls])
    return levels[level_idx], level_idx


@partial(jax.jit, static_argnames=("B", "smax"))
def _dp_solve_jit(grad, u_old, levels, jump_cost, tau, B: int, smax: int):
    stage, btilde = stage_tables(grad, u_old, levels, tau)
    U, phi0 = build_tables(stage, btilde, jump_cost, B, smax)
    u, level_idx = backtrack(U, phi0, btilde, levels, jnp.int32(B))
    return u, level_idx, (U, phi0, btilde)


def dp_solve(grad, u_old, levels, jump_cost, tau, B: int, smax: int = None):
    """One-shot DP: build tables and extract the optimal control.

    Returns ``(u, level_idx, tables)`` where ``tables = (U, phi0, btilde)``
    can be re-used by :func:`backtrack` for budget-halved re-extraction.
    ``smax`` (static per-step budget-use bound) is derived from the concrete
    level set when not given.
    """
    if smax is None:
        smax = max_budget_use(levels)
    return _dp_solve_jit(grad, u_old, levels, jump_cost, tau, B, smax)
