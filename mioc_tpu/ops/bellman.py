"""Bellman dynamic program for the TV trust-region subproblem (reference scan path).

This is the TPU-native re-design of the reference's hot loop
(``bellman_TRM!`` at ``/root/reference/HelpFunctions.jl:20-83`` and
``eval_u_TRM!`` at ``:98-124``).  The subproblem solved exactly is

    min_u  Σ_i τ·∇f_i·u_i  +  β·TV_p(u)      s.t.  Σ_i ‖u_i − u_old_i‖₁ ≤ B,
                                                    u_i ∈ {ν_0, …, ν_{L−1}}

over piecewise-constant controls on the time grid.  Instead of the reference's
four nested Julia loops over ``(i, l, j, b)``, each backward time step is a
**min-plus (tropical) contraction with a budget shift**, vectorized over the
whole ``(budget b, level-combination l)`` plane and scanned over time with
``lax.scan``:

    tmp[b, l]  = min_j ( Φ_{i+1}[b, j] + jump[l, j] )           (tropical matvec)
    Φ_i[b, l]  = stage[i, l] + tmp[b − b̃[i, l], l]              (budget shift)
                 (entries with b < b̃[i, l] are +inf)

Semantics preserved from the reference:
  * the budget axis tracks the EXACT accumulated L¹ deviation from ``u_old``
    (terminal layer seeds only ``b = b̃``, ``HelpFunctions.jl:40-42``);
  * ``Φ`` is double-buffered over time — here simply the scan carry;
  * ``U[k, b, l]`` stores the argmin successor combination at time ``k+1``
    given combination ``l`` at time ``k`` (int32; the reference stores full
    index tuples, we store the flat combination index);
  * argmin tie-breaking: first minimal ``j`` in enumeration order (the
    reference's strict-improvement update keeps the earliest ``j``), and the
    backtrack seed argmin scans ``b`` fastest then ``l`` (Julia column-major
    ``argmin``, ``HelpFunctions.jl:106``).
  * budget-halving reuse: ``backtrack`` takes ``B_new`` as a *traced* argument
    so a halved trust region re-extracts the path from the same tables with no
    DP rebuild and no recompilation (``multi-trust.jl:108-110``).

Shapes are time-major: ``grad``/``u_old`` are ``(nt, M)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "stage_tables",
    "build_tables",
    "backtrack",
    "dp_solve",
]

_INF = jnp.inf


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


def _min_argmin_j(phi, jump_cost):
    """Tropical contraction: min/argmin over successor combinations ``j``.

    phi: (B+1, L) value table at time i+1; jump_cost: (L, L) with
    ``jump_cost[l, j]`` the cost of switching l→j.  Returns (B+1, L) min
    values and int32 argmins (first minimal j on ties).
    """
    tot = phi[:, None, :] + jump_cost[None, :, :]  # (B+1, l, j)
    arg = jnp.argmin(tot, axis=-1).astype(jnp.int32)
    val = jnp.min(tot, axis=-1)
    return val, arg


@partial(jax.jit, static_argnames=("B",))
def build_tables(stage, btilde, jump_cost, B: int):
    """Backward value recursion; returns ``(U, phi0)``.

    U:    (nt-1, B+1, L) int32 argmin-successor table.
    phi0: (B+1, L) value table at the first time step (the only Φ slice the
          backtrack needs — the reference's ``Φ[…, 1]``).
    """
    nt, L = stage.shape
    b_grid = jnp.arange(B + 1, dtype=jnp.int32)[:, None]  # (B+1, 1)

    # Terminal layer i = nt-1: exact-budget seed (HelpFunctions.jl:29-43).
    phi_T = jnp.where(b_grid == btilde[-1][None, :], stage[-1][None, :], _INF)

    def step(phi, xs):
        stage_i, btilde_i = xs  # (L,), (L,)
        val, arg = _min_argmin_j(phi, jump_cost)
        shifted = b_grid - btilde_i[None, :]  # (B+1, L)
        gather_b = jnp.clip(shifted, 0, B)
        new_phi = jnp.where(
            shifted >= 0,
            stage_i[None, :] + jnp.take_along_axis(val, gather_b, axis=0),
            _INF,
        )
        U_i = jnp.take_along_axis(arg, gather_b, axis=0)
        return new_phi, U_i

    # Sweep i = nt-2 … 0; scan emits rows in sweep order, so flip to get
    # U[k] = transition table for time k → k+1.
    phi0, U_rev = lax.scan(step, phi_T, (stage[:-1][::-1], btilde[:-1][::-1]))
    return U_rev[::-1], phi0


@jax.jit
def backtrack(U, phi0, btilde, levels, B_new):
    """Extract the optimal control from the DP tables (``eval_u_TRM!``).

    ``B_new`` is traced: a halved trust region only masks the seed argmin to
    budgets ``≤ B_new`` and re-chases the same ``U``.  Returns
    ``(u, level_idx)`` with ``u`` of shape ``(nt, M)``.
    """
    B1, L = phi0.shape
    levels = jnp.asarray(levels, dtype=phi0.dtype)

    masked = jnp.where(jnp.arange(B1, dtype=jnp.int32)[:, None] <= B_new, phi0, _INF)
    # Julia argmin is column-major: b varies fastest, then l (HelpFunctions.jl:106).
    flat_idx = jnp.argmin(masked.T.reshape(-1))
    l0 = (flat_idx // B1).astype(jnp.int32)
    b0 = (flat_idx % B1).astype(jnp.int32)

    def chase(carry, xs):
        l, b = carry
        U_k, btilde_k = xs
        nl = U_k[b, l]
        nb = b - btilde_k[l]  # decrement AFTER lookup (HelpFunctions.jl:115-122)
        return (nl, nb), nl

    _, ls = lax.scan(chase, (l0, b0), (U, btilde[:-1]))
    level_idx = jnp.concatenate([l0[None], ls])
    return levels[level_idx], level_idx


@partial(jax.jit, static_argnames=("B",))
def dp_solve(grad, u_old, levels, jump_cost, tau, B: int):
    """One-shot DP: build tables and extract the optimal control.

    Returns ``(u, level_idx, tables)`` where ``tables = (U, phi0, btilde)``
    can be re-used by :func:`backtrack` for budget-halved re-extraction.
    """
    stage, btilde = stage_tables(grad, u_old, levels, tau)
    U, phi0 = build_tables(stage, btilde, jump_cost, B)
    u, level_idx = backtrack(U, phi0, btilde, levels, jnp.int32(B))
    return u, level_idx, (U, phi0, btilde)
