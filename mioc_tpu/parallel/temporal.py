"""Temporal (sequence-axis) parallelization of the Bellman DP — banded form.

The backward value recursion is a chain of min-plus (tropical) linear
operators over the state ``s = (budget b, combination l)``:

    Φ_i = T_i ⊗ Φ_{i+1},    (T ⊗ v)[s] = min_{s'} T[s, s'] + v[s']

Because ⊗ is associative the sweep parallelizes over time — the DP analogue
of sequence/context-parallel scaling (SURVEY.md §5; cf. Särkkä &
García-Fernández, "Temporal parallelisation of dynamic programming and linear
quadratic control").  A naive realization materializes ``(nt, S, S)``
operators with ``S = (B+1)·L`` — ~50 GB at the heat preset — so this module
exploits two structural properties of the per-step operator instead:

* **budget-shift invariance**: ``T_i[(b, l), (b', j)]`` is finite only for
  ``b' = b − b̃_i[l]`` and its value is independent of ``b`` — so any
  composition of steps is a function of ``(l, d, j)`` only, where
  ``d = b − b'`` is the total budget spent;
* **bandedness**: a composition of ``K`` steps has ``d ≤ min(B, K·smax)``
  (``smax`` = L¹ diameter of the level set), so a chunk operator is a small
  ``(L, W, L)`` band, ``W = min(B, K·smax)+1`` — never ``(S, S)``.

Two-level schedule (sequential critical path ``K + C ≈ 2·√nt`` instead of
``nt``):

1. **chunk operators** (vmapped over the ``C`` chunks — each is a ``K``-step
   sequential fold, all chunks in parallel): ``G_c[l, d, j]`` composed from
   the per-step operators;
2. **boundary sweep** (``C`` sequential banded op⊗vector applications):
   ``Ψ_c = G_c ⊗ Ψ_{c+1}`` from the terminal layer;
3. **interior recovery** (vmapped over chunks, ``K`` sequential per-step
   op⊗vector applications each): all suffix value tables
   ``phis (nt, B+1, L)`` for the backtrack.

Memory: ``C·L·W·L`` for the operators plus ``nt·(B+1)·L`` for the tables —
~34 MB + 30 MB at the heat preset (L=36, B=204, nt=1024), where the naive
form needs ~53 GB.  Monotonicity of the budget (``b̃ ≥ 0``) makes the banded
composition exact: a path's intermediate budget is always ≥ its final one, so
truncating at ``d ≤ B`` inside chunks loses only paths the sequential DP
drops too.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.bellman import max_budget_use, stage_tables

__all__ = [
    "temporal_tables",
    "temporal_tables_sharded",
    "temporal_backtrack",
    "temporal_dp_solve",
]

_INF = np.float64(np.inf)


def _shift_d(arr, shifts, smax, axis):
    """``out[..., d, ...] = arr[..., d − shift, ...]`` (entries ``d < shift``
    get +inf) as a select over the ``smax+1`` static rolls; ``shifts``
    broadcasts against ``arr`` with the rolled axis set to 1."""
    W = arr.shape[axis]
    d_iota = jax.lax.broadcasted_iota(jnp.int32, arr.shape, axis)
    out = jnp.full_like(arr, _INF)
    for s in range(smax + 1):
        rolled = jnp.roll(arr, s, axis=axis) if s else arr
        cand = jnp.where(d_iota >= s, rolled, _INF)
        out = jnp.where(shifts == s, cand, out)
    return out


def _identity_op(L: int, W: int, dtype):
    """Banded identity operator: 0 on (l = j, d = 0), +inf elsewhere."""
    return jnp.where(
        (jnp.arange(L)[:, None, None] == jnp.arange(L)[None, None, :])
        & (jnp.arange(W)[None, :, None] == 0),
        jnp.asarray(0.0, dtype), _INF,
    )  # (L, W, L)


def _chunk_op(st_c, bt_c, ok_c, jump, smax: int, W: int):
    """Compose one chunk's ``K`` per-step operators into a banded
    ``G[l, d, j]`` (sequential fold; chunks are independent)."""
    L = jump.shape[0]

    def fold(G, xs):
        stage_i, btilde_i, ok = xs
        # tmp[l, d, j] = min_m jump[l, m] + G[m, d, j]  (running min over m).
        acc = jump[:, 0, None, None] + G[0][None]
        for m in range(1, L):
            acc = jnp.minimum(acc, jump[:, m, None, None] + G[m][None])
        out = _shift_d(acc, btilde_i[:, None, None], smax, axis=1)
        out = stage_i[:, None, None] + out
        return jnp.where(ok, out, G), None

    G, _ = lax.scan(fold, _identity_op(L, W, st_c.dtype),
                    (st_c[::-1], bt_c[::-1], ok_c[::-1]))
    return G


def _apply_op(G, phi, W: int, b_ax):
    """Banded op ⊗ vector: ``out[b, l] = min_{d ≤ b, j} G[l, d, j] + phi[b − d, j]``."""
    L = G.shape[0]
    dtype = phi.dtype
    phipad = jnp.concatenate([jnp.full((W - 1, L), _INF, dtype), phi])
    idx = (W - 1) + b_ax[None, :] - jnp.arange(W)[:, None]  # (W, B+1)
    windows = phipad[idx]  # (W, B+1, L)
    acc = None
    for j in range(L):
        term = G[:, :, j][:, :, None] + windows[:, :, j][None]  # (L, W, B+1)
        acc = term if acc is None else jnp.minimum(acc, term)
    return acc.min(axis=1).T  # (B+1, L)


def _recover(phi_end, st_c, bt_c, ok_c, jump, smax: int):
    """All interior suffix tables of one chunk from its end-boundary value."""
    def step_vec(phi, xs):
        stage_i, btilde_i, ok = xs
        tmp = jnp.min(jump[None, :, :] + phi[:, None, :], axis=2)  # (B+1, L)
        new = stage_i[None, :] + _shift_d(tmp, btilde_i[None, :], smax, axis=0)
        new = jnp.where(ok, new, phi)
        return new, new

    _, out_rev = lax.scan(step_vec, phi_end,
                          (st_c[::-1], bt_c[::-1], ok_c[::-1]))
    return out_rev[::-1]  # Φ at padded positions cK … (c+1)K−1


@partial(jax.jit, static_argnames=("B", "smax", "chunk"))
def temporal_tables(stage, btilde, jump_cost, B: int, smax: int = None,
                    chunk: int = None):
    """All suffix value tables ``phis (nt, B+1, L)`` via the banded two-level
    temporal parallelization.  ``smax`` is the static per-step budget-use
    bound (:func:`~mioc_tpu.ops.bellman.max_budget_use`; defaults to ``B``);
    ``chunk`` is the chunk length ``K`` (default ``≈ √(nt−1)``)."""
    nt, L = stage.shape
    if smax is None:
        smax = B
    smax = min(smax, B)
    ns = nt - 1
    K = chunk or max(1, int(math.ceil(math.sqrt(ns))))
    K = min(K, ns) if ns else 1
    C = -(-ns // K) if ns else 0
    pad = C * K - ns
    W = min(B, K * smax) + 1

    dtype = stage.dtype
    jump = jump_cost.astype(dtype)

    # Terminal layer Φ_{nt-1}[b, l] (exact-budget seed, HelpFunctions.jl:29-43).
    b_ax = jnp.arange(B + 1, dtype=jnp.int32)
    phi_T = jnp.where(
        b_ax[:, None] == btilde[-1][None, :], stage[-1][None, :], _INF
    ).astype(dtype)  # (B+1, L)

    if C == 0:
        return phi_T[None]

    # Padded per-step operator data; identity steps (valid=False) in front.
    st = jnp.concatenate([jnp.zeros((pad, L), dtype), stage[:-1]])
    bt = jnp.concatenate([jnp.zeros((pad, L), jnp.int32), btilde[:-1]])
    valid = jnp.concatenate(
        [jnp.zeros((pad,), bool), jnp.ones((ns,), bool)]
    )
    st, bt, valid = (a.reshape((C, K) + a.shape[1:]) for a in (st, bt, valid))

    # -- 1. chunk operators (vmapped over chunks) -----------------------------
    Gs = jax.vmap(lambda s, b, o: _chunk_op(s, b, o, jump, smax, W))(
        st, bt, valid
    )  # (C, L, W, L)

    # -- 2. boundary sweep (C sequential banded op ⊗ vector) ------------------
    def bstep(phi, G):
        new = _apply_op(G, phi, W, b_ax)
        return new, new

    _, Psis_rev = lax.scan(bstep, phi_T, Gs[::-1])
    # Psis[c] = Φ at padded boundary position c·K, c = 0 … C-1.
    Psis = Psis_rev[::-1]
    # Chunk c's recovery starts from the NEXT boundary (Ψ_{c+1}); Ψ_C = φ_T.
    Psis_next = jnp.concatenate([Psis[1:], phi_T[None]])

    # -- 3. interior recovery (vmapped over chunks) ---------------------------
    interior = jax.vmap(lambda p, s, b, o: _recover(p, s, b, o, jump, smax))(
        Psis_next, st, bt, valid
    )  # (C, K, B+1, L)
    phis = jnp.concatenate(
        [interior.reshape(C * K, B + 1, L)[pad:], phi_T[None]]
    )
    return phis


def temporal_tables_sharded(stage, btilde, jump_cost, B: int, smax: int,
                            mesh, axis: str = "batch", chunk: int = None):
    """Time-axis (sequence-parallel) sharding of the banded temporal DP.

    The chunk axis is partitioned over the mesh's ``axis`` with ``shard_map``:

    * each device composes the chunk operators of the chunks it OWNS
      (step 1 — the dominant O(ns·L²·W) work runs fully device-parallel);
    * the boundary sweep (step 2, the O(C) sequential critical path) runs on
      an ``all_gather`` of the small ``(C, L, W, L)`` operator band — the
      honest serialization of temporal DP across devices;
    * interior recovery (step 3) again runs only on each device's own chunks.

    Returns the same suffix tables as :func:`temporal_tables` (the number of
    chunks is rounded up to a multiple of the axis size with identity-step
    padding, which does not change any value).  Consumed unchanged by
    :func:`temporal_backtrack`, including traced-``B_new`` halving reuse.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    nt, L = stage.shape
    if smax is None:
        smax = B
    smax = min(smax, B)
    ns = nt - 1
    D = mesh.shape[axis]
    K = chunk or max(1, int(math.ceil(math.sqrt(ns))))
    K = min(K, ns) if ns else 1
    C = -(-ns // K) if ns else 0
    C = -(-C // D) * D if C else 0  # chunks divisible by the mesh axis
    pad = C * K - ns
    W = min(B, K * smax) + 1

    dtype = stage.dtype
    jump = jump_cost.astype(dtype)
    b_ax = jnp.arange(B + 1, dtype=jnp.int32)
    phi_T = jnp.where(
        b_ax[:, None] == btilde[-1][None, :], stage[-1][None, :], _INF
    ).astype(dtype)  # (B+1, L)
    if C == 0:
        return phi_T[None]

    st = jnp.concatenate([jnp.zeros((pad, L), dtype), stage[:-1]])
    bt = jnp.concatenate([jnp.zeros((pad, L), jnp.int32), btilde[:-1]])
    valid = jnp.concatenate([jnp.zeros((pad,), bool), jnp.ones((ns,), bool)])
    st, bt, valid = (a.reshape((C, K) + a.shape[1:]) for a in (st, bt, valid))

    def body(st_b, bt_b, ok_b, phi_T_b):
        Cd = st_b.shape[0]  # chunks owned by this device
        d = lax.axis_index(axis)
        # 1. own-chunk operators (device-parallel).
        Gs_loc = jax.vmap(lambda s, b, o: _chunk_op(s, b, o, jump, smax, W))(
            st_b, bt_b, ok_b
        )
        # 2. boundary sweep over the gathered operator band (replicated).
        Gs = lax.all_gather(Gs_loc, axis, tiled=True)  # (C, L, W, L)

        def bstep(phi, G):
            new = _apply_op(G, phi, W, b_ax)
            return new, new

        _, Psis_rev = lax.scan(bstep, phi_T_b, Gs[::-1])
        Psis_next = jnp.concatenate([Psis_rev[::-1][1:], phi_T_b[None]])
        # 3. recover only the chunks this device owns.
        Psis_loc = lax.dynamic_slice_in_dim(Psis_next, d * Cd, Cd, 0)
        return jax.vmap(lambda p, s, b, o: _recover(p, s, b, o, jump, smax))(
            Psis_loc, st_b, bt_b, ok_b
        )  # (Cd, K, B+1, L)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    interior = fn(st, bt, valid, phi_T)  # (C, K, B+1, L) chunk-sharded
    phis = jnp.concatenate(
        [interior.reshape(C * K, B + 1, L)[pad:], phi_T[None]]
    )
    return phis


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


def temporal_dp_solve(grad, u_old, levels, jump_cost, tau, B: int,
                      chunk: int = None):
    """Solve the trust-region subproblem via the banded temporal DP.

    Same semantics as :func:`mioc_tpu.ops.bellman.dp_solve`; returns
    ``(u, level_idx, phis)`` with ``phis (nt, B+1, L)`` the suffix value
    tables (reusable by :func:`temporal_backtrack` at smaller budgets).
    """
    smax = max_budget_use(levels)
    stage, btilde = stage_tables(grad, u_old, levels, tau)
    phis = temporal_tables(stage, btilde, jump_cost, B, smax, chunk)
    u, level_idx = temporal_backtrack(phis, btilde, jump_cost, levels,
                                      jnp.int32(B))
    return u, level_idx, phis
