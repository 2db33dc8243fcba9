"""Temporal (sequence-axis) parallelization of the Bellman DP.

The backward value recursion is a chain of min-plus (tropical) linear
operators over the state ``s = (budget b, combination l)``:

    Φ_i = T_i ⊗ Φ_{i+1},    (T ⊗ v)[s] = min_{s'} T[s, s'] + v[s']

Because ⊗ is associative, the whole sweep parallelizes over time with
``lax.associative_scan`` on the per-step transition matrices — log₂(nt) depth
instead of nt sequential steps.  This is the DP analogue of
sequence/context-parallel scaling (SURVEY.md §5 long-context notes; cf.
Särkkä & García-Fernández, "Temporal parallelisation of dynamic programming
and linear quadratic control").

Cost: materializing T costs ``nt·S²`` memory and each combine ``S³`` min-plus
work with ``S = (B+1)·L`` — worthwhile for long horizons with small budgets
(or across many devices where the scan's combines shard over time).  The
optimal path is recovered directly from the suffix value tables (no argmin
``U`` table needed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.bellman import stage_tables

__all__ = ["temporal_tables", "temporal_backtrack", "temporal_dp_solve"]


def _minplus_matmul(A, Bm):
    """Tropical matrix product: C[a, c] = min_b A[a, b] + B[b, c]."""
    return jnp.min(A[..., :, :, None] + Bm[..., None, :, :], axis=-2)


@partial(jax.jit, static_argnames=("B",))
def temporal_tables(stage, btilde, jump_cost, B: int):
    """All suffix value tables ``phis (nt, B+1, L)`` via associative scan."""
    nt, L = stage.shape
    S = (B + 1) * L
    b = jnp.arange(B + 1, dtype=jnp.int32)

    # Per-step operator T_i[(b,l), (b',j)] for i = 0 … nt-2:
    #   finite iff b' == b − b̃_i[l] (and ≥ 0), value stage_i[l] + jump[l, j].
    def make_T(stage_i, btilde_i):
        bp = b[:, None, None, None] - btilde_i[None, :, None, None]  # (B+1, L, 1, 1)
        ok = (bp >= 0) & (bp == b[None, None, :, None])
        val = stage_i[None, :, None, None] + jump_cost[None, :, None, :]
        T = jnp.where(ok, val, jnp.inf)  # (B+1, L, B+1, L)
        return T.reshape(S, S)

    Ts = jax.vmap(make_T)(stage[:-1], btilde[:-1])  # (nt-1, S, S)

    # Suffix products: P_i = T_i ⊗ T_{i+1} ⊗ … ⊗ T_{nt-2}.  Reverse the time
    # axis and flip the (non-commutative) combine so the scan's inclusive
    # prefixes become right-to-left suffix products.
    P_rev = lax.associative_scan(lambda A, Bm: _minplus_matmul(Bm, A), Ts[::-1])
    Ps = P_rev[::-1]  # Ps[i] = T_i ⊗ … ⊗ T_{nt-2}

    # Terminal layer as a vector over s = (b, l).
    phi_T = jnp.where(
        b[:, None] == btilde[-1][None, :], stage[-1][None, :], jnp.inf
    ).reshape(S)
    phis = jnp.concatenate(
        [jnp.min(Ps + phi_T[None, None, :], axis=-1), phi_T[None]]
    )  # (nt, S): Φ_i for i = 0 … nt-1
    return phis.reshape(nt, B + 1, L)


@jax.jit
def temporal_backtrack(phis, btilde, jump_cost, levels, B_new):
    """Path extraction from the suffix value tables (greedy argmin, identical
    tie-breaking to the sequential backtrack).  ``B_new`` is traced, so
    trust-region halvings reuse the same ``phis``."""
    nt, B1, L = phis.shape
    B = B1 - 1
    b = jnp.arange(B1, dtype=jnp.int32)
    phi0 = phis[0]
    masked = jnp.where(b[:, None] <= B_new, phi0, jnp.inf)
    flat = jnp.argmin(masked.T.reshape(-1))  # b fastest within l
    l0 = (flat // (B + 1)).astype(jnp.int32)
    b0 = (flat % (B + 1)).astype(jnp.int32)

    def chase(carry, xs):
        l, bb = carry
        phi_next, btilde_i = xs
        # Successor: argmin_j jump[l, j] + Φ_{i+1}[b − b̃_i[l], j]
        b_rem = bb - btilde_i[l]
        cand = jump_cost[l] + phi_next[b_rem]
        nl = jnp.argmin(cand).astype(jnp.int32)
        return (nl, b_rem), nl

    _, ls = lax.scan(chase, (l0, b0), (phis[1:], btilde[:-1]))
    level_idx = jnp.concatenate([l0[None], ls])
    u = jnp.asarray(levels, phis.dtype)[level_idx]
    return u, level_idx


def temporal_dp_solve(grad, u_old, levels, jump_cost, tau, B: int):
    """Solve the trust-region subproblem via associative min-plus scan.

    Same semantics as :func:`mioc_tpu.ops.bellman.dp_solve`; returns
    ``(u, level_idx, phis)`` with ``phis (nt, B+1, L)`` the suffix value
    tables (reusable by :func:`temporal_backtrack` at smaller budgets).
    """
    stage, btilde = stage_tables(grad, u_old, levels, tau)
    phis = temporal_tables(stage, btilde, jump_cost, B)
    u, level_idx = temporal_backtrack(phis, btilde, jump_cost, levels, jnp.int32(B))
    return u, level_idx, phis
