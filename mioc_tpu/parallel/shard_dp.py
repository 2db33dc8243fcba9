"""Level-axis sharding of the Bellman contraction (tensor-parallel DP).

For large admissible sets the per-step work is O(L²·B): a min-plus
contraction over the successor axis ``j``.  This module partitions ``j``
across the ``level`` axis of a device mesh with ``shard_map``: each device
owns a block of ``jump_cost`` columns and of the Φ rows, computes its local
(min, argmin) partials, and the full reduction is an ``all_gather`` of the
``D`` partial pairs followed by an on-device min — the TPU-native analogue of
the column-parallel matmul + all-reduce pattern (SURVEY.md §2 parallelism
inventory, item iii).

``L`` not divisible by the level-axis size is handled by inf-padding the
level axis (padded rows/columns are never selected); the returned padded
tables are consumed unchanged by :func:`mioc_tpu.ops.bellman.backtrack`,
including the traced-``B_new`` halving reuse.  :func:`dp_body` is the raw
per-shard computation, reusable inside an enclosing ``shard_map`` (e.g. the
combined batch×level TRM step, :func:`mioc_tpu.parallel.batch.make_ode_trm_step`).

Tie-breaking matches the unsharded kernel (first minimal global ``j``): the
partial argmins carry GLOBAL j indices and the cross-device combine prefers
lower shard index on equal values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

__all__ = ["build_tables_sharded", "dp_body", "pad_level_axis"]


def pad_level_axis(stage, btilde, jump_cost, D: int, B: int):
    """Pad the level axis to a multiple of ``D`` with inert rows/columns
    (+inf stage and jump, budget use ``B+1`` so the rows never seed)."""
    L = stage.shape[-1]
    Lp = -(-L // D) * D
    if Lp == L:
        return stage, btilde, jump_cost, L
    pad = Lp - L
    stage_p = jnp.concatenate(
        [stage, jnp.full(stage.shape[:-1] + (pad,), jnp.inf, stage.dtype)], -1
    )
    btilde_p = jnp.concatenate(
        [btilde, jnp.full(btilde.shape[:-1] + (pad,), B + 1, btilde.dtype)], -1
    )
    jump_p = jnp.full((Lp, Lp), jnp.inf, jump_cost.dtype)
    jump_p = jump_p.at[:L, :L].set(jump_cost)
    return stage_p, btilde_p, jump_p, L


def dp_body(stage_s, btilde_s, jump_block, B: int, axis: str = "level"):
    """Per-shard DP sweep: ``jump_block (Lp, Lp/D)`` holds this device's
    successor columns; stage/btilde are replicated ``(nt, Lp)``.  Must run
    inside a ``shard_map`` with a mesh axis named ``axis``.  Returns the
    full (replicated) padded tables ``(U, phi0)``."""
    nt, Lp = stage_s.shape
    Ld = jump_block.shape[1]
    d = lax.axis_index(axis)
    j_base = d * Ld
    b_grid = jax.lax.broadcasted_iota(jnp.int32, (1, B + 1), 1)

    phi_T_full = jnp.where(
        b_grid == btilde_s[-1][:, None], stage_s[-1][:, None], jnp.inf
    )  # (Lp, B+1) replicated

    def step(phi_full, xs):
        stage_i, btilde_i = xs
        # Local block of Φ rows: the j-range this device contracts over.
        phi_blk = lax.dynamic_slice_in_dim(phi_full, j_base, Ld, 0)
        tot = phi_blk[None, :, :] + jump_block[:, :, None]  # (Lp, Lp/D, B+1)
        val_loc = jnp.min(tot, axis=1)
        arg_loc = (jnp.argmin(tot, axis=1).astype(jnp.int32) + j_base)
        # Cross-device min with first-minimal-global-j tie-breaking:
        vals = lax.all_gather(val_loc, axis)  # (D, Lp, B+1)
        args = lax.all_gather(arg_loc, axis)
        pick = jnp.argmin(vals, axis=0)  # first minimal shard (= lowest j)
        val = jnp.take_along_axis(vals, pick[None], axis=0)[0]
        arg = jnp.take_along_axis(args, pick[None], axis=0)[0]

        shifted = jnp.arange(B + 1, dtype=jnp.int32)[None, :] - btilde_i[:, None]
        gather_b = jnp.clip(shifted, 0, B)
        new_phi = jnp.where(
            shifted >= 0,
            stage_i[:, None] + jnp.take_along_axis(val, gather_b, axis=1),
            jnp.inf,
        )
        U_i = jnp.where(
            shifted >= 0, jnp.take_along_axis(arg, gather_b, axis=1), 0
        )
        return new_phi, U_i

    phi0, U_rev = lax.scan(
        step, phi_T_full, (stage_s[:-1][::-1], btilde_s[:-1][::-1])
    )
    return U_rev[::-1], phi0


def build_tables_sharded(stage, btilde, jump_cost, B: int, smax: int, mesh):
    """Sharded equivalent of :func:`mioc_tpu.ops.bellman.build_tables`.

    ``jump_cost`` is partitioned over columns (successor ``j``) on the mesh's
    ``level`` axis; Φ rows are partitioned the same way so each device holds
    the Φ block its ``j`` columns contract against.  Returns full (replicated)
    ``(U, phi0)``, padded on the level axis when ``L`` does not divide the
    axis size — :func:`~mioc_tpu.ops.bellman.backtrack` consumes either form,
    but pass it the same padded ``btilde`` (see ``tests/test_parallel.py``).
    """
    D = mesh.shape["level"]
    stage, btilde, jump_cost, _ = pad_level_axis(stage, btilde, jump_cost, D, B)

    fn = shard_map(
        lambda s, b, j: dp_body(s, b, j, B),
        mesh=mesh,
        in_specs=(P(), P(), P(None, "level")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(stage, btilde, jump_cost)
