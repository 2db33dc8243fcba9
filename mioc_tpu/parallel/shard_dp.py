"""Level-axis sharding of the Bellman contraction (tensor-parallel DP).

For large admissible sets the per-step work is O(L²·B): a min-plus
contraction over the successor axis ``j``.  This module partitions ``j``
across the ``level`` axis of a device mesh with ``shard_map``: each device
owns a block of ``jump_cost`` columns and of the Φ rows, computes its local
(min, argmin) partials, and the full reduction is an ``all_gather`` of the
``D`` partial pairs followed by an on-device min — the TPU-native analogue of
the column-parallel matmul + all-reduce pattern (SURVEY.md §2 parallelism
inventory, item iii).

Tie-breaking matches the unsharded kernel (first minimal global ``j``): the
partial argmins carry GLOBAL j indices and the cross-device combine prefers
lower shard index on equal values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

__all__ = ["build_tables_sharded"]


def build_tables_sharded(stage, btilde, jump_cost, B: int, smax: int, mesh):
    """Sharded equivalent of :func:`mioc_tpu.ops.bellman.build_tables`.

    ``jump_cost`` is partitioned over columns (successor ``j``) on the mesh's
    ``level`` axis; Φ rows are partitioned the same way so each device holds
    the Φ block its ``j`` columns contract against.  Returns full (replicated)
    ``(U, phi0)`` identical to the unsharded tables.
    """
    nt, L = stage.shape
    D = mesh.shape["level"]
    if L % D:
        raise ValueError(f"L={L} not divisible by level-axis size {D}")
    b_grid = jax.lax.broadcasted_iota(jnp.int32, (1, B + 1), 1)

    def body(stage_s, btilde_s, jump_block):
        # jump_block: (L, L/D) — this device's successor columns.
        d = lax.axis_index("level")
        Ld = L // D
        j_base = d * Ld

        phi_T_full = jnp.where(
            b_grid == btilde_s[-1][:, None], stage_s[-1][:, None], jnp.inf
        )  # (L, B+1) replicated

        def step(phi_full, xs):
            stage_i, btilde_i = xs
            # Local block of Φ rows: the j-range this device contracts over.
            phi_blk = lax.dynamic_slice_in_dim(phi_full, j_base, Ld, 0)
            tot = phi_blk[None, :, :] + jump_block[:, :, None]  # (L, L/D, B+1)
            val_loc = jnp.min(tot, axis=1)
            arg_loc = (jnp.argmin(tot, axis=1).astype(jnp.int32) + j_base)
            # Cross-device min with first-minimal-global-j tie-breaking:
            vals = lax.all_gather(val_loc, "level")  # (D, L, B+1)
            args = lax.all_gather(arg_loc, "level")
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

        phi0, U_rev = lax.scan(step, phi_T_full, (stage_s[:-1][::-1], btilde_s[:-1][::-1]))
        return U_rev[::-1], phi0

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(None, "level")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(stage, btilde, jump_cost)
