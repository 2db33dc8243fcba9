"""Pallas TPU kernel for the DP backtrack (path extraction).

The XLA-scan backtrack (:func:`mioc_tpu.ops.bellman.backtrack`) performs one
dynamic scalar gather per time step; on TPU each such step costs microseconds
of dispatch, dwarfing the fused DP build.  This kernel runs the whole chase
on-chip:

  * seed: masked argmin over ``Φ_0`` in the reference's column-major order
    (budget fastest, then combination — ``HelpFunctions.jl:106``), computed
    with vector reductions;
  * chase: ``l ← U[k, l, b]``, ``b ← b − b̃[k, l]`` with ``U`` planes
    prefetched from HBM in double-buffered chunks of ``K`` time steps.

``B_new`` stays a runtime scalar (SMEM), so trust-region halvings re-run this
kernel on the same tables without recompilation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["backtrack_pallas"]

_INF = np.float32(np.inf)
_BIG = np.int32(2**30)


def _bt_kernel(
    bnew_ref,     # (1, 1) i32, SMEM
    phi0_ref,     # (Lp, Bp) f32, VMEM
    btilde_ref,   # (nt, Lp) i32, VMEM
    U_hbm_ref,    # (nsteps_pad, Lp, Bp) i32, HBM
    idx_ref,      # out: (1, ntp) i32, VMEM row (per-step scalar stores are
                  #   not allowed on TPU, and an SMEM output of nt scalars
                  #   blows the 1 MB SMEM budget)
    u_buf_ref,    # scratch: (2, K, Lp, Bp) i32
    idx_buf_ref,  # scratch: (1, 128) i32 — staging row for idx writes.
                  #   Masked updates on the full (1, ntp) row would cost
                  #   O(nt) lanes PER STEP = O(nt²) total (measured 25 ms at
                  #   nt=8192); staging 128 entries and flushing one chunk
                  #   slice keeps it O(nt·128).
    sem,          # DMA semaphores (2,)
    *,
    nt: int,
    K: int,
):
    Lp, Bp = phi0_ref.shape
    nsteps = nt - 1
    nchunks = -(-nsteps // K)
    b_lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, Bp), 1)
    l_sub = jax.lax.broadcasted_iota(jnp.int32, (Lp, Bp), 0)
    t128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # Seed argmin, reference order: linear index l*Bp + b, b fastest within l.
    masked = jnp.where(b_lane <= bnew_ref[0, 0], phi0_ref[:], _INF)
    mval = jnp.min(masked)
    lin = jnp.where(masked == mval, l_sub * Bp + b_lane, _BIG)
    pick = jnp.min(lin)
    l0 = pick // Bp
    b0 = pick - l0 * Bp
    idx_buf_ref[:] = jnp.where(t128 == 0, l0, jnp.zeros((1, 128), jnp.int32))

    # Prefetch the first two U chunks.
    def start_chunk(c):
        size = K  # planes beyond nsteps are padded in U_hbm
        pltpu.make_async_copy(
            U_hbm_ref.at[pl.ds(c * K, size)], u_buf_ref.at[c % 2], sem.at[c % 2]
        ).start()

    start_chunk(0)
    if nchunks > 1:
        start_chunk(1)

    def step(k, carry):
        l, b = carry
        chunk = k // K
        row = k - chunk * K
        slot = jax.lax.rem(chunk, 2)

        @pl.when(row == 0)
        def _():
            pltpu.make_async_copy(
                U_hbm_ref.at[pl.ds(chunk * K, K)], u_buf_ref.at[slot], sem.at[slot]
            ).wait()

        # Dynamic lane extraction is not allowed on TPU — select the (l, b)
        # entry with a masked vector reduction instead.
        plane = u_buf_ref[slot, row]  # (Lp, Bp)
        l_next = jnp.max(jnp.where((l_sub == l) & (b_lane == b), plane, 0))
        bt_row = btilde_ref[pl.ds(k, 1), :]  # (1, L) — btilde may be unpadded
        bt_iota = jax.lax.broadcasted_iota(jnp.int32, bt_row.shape, 1)
        bt_l = jnp.max(jnp.where(bt_iota == l, bt_row, 0))
        b_next = b - bt_l  # decrement AFTER lookup

        # Stage idx[k+1] into the 128-wide buffer; flush a full chunk slice
        # on crossing each 128 boundary.
        p = k + 1
        out_chunk = p // 128
        out_row = p - out_chunk * 128

        @pl.when(out_row == 0)
        def _():
            idx_ref[:, pl.ds((out_chunk - 1) * 128, 128)] = idx_buf_ref[:]
            idx_buf_ref[:] = jnp.zeros((1, 128), jnp.int32)

        idx_buf_ref[:] = jnp.where(t128 == out_row, l_next, idx_buf_ref[:])

        @pl.when((row == K - 1) & (chunk + 2 <= nchunks - 1))
        def _():
            pltpu.make_async_copy(
                U_hbm_ref.at[pl.ds((chunk + 2) * K, K)],
                u_buf_ref.at[slot],
                sem.at[slot],
            ).start()

        return (l_next, b_next)

    jax.lax.fori_loop(0, nsteps, step, (l0, b0))
    # Flush the final (possibly partial) staging chunk; entries past nt are
    # padding the caller slices off.
    idx_ref[:, pl.ds((nsteps // 128) * 128, 128)] = idx_buf_ref[:]


def _backtrack_impl(U, phi0, btilde, levels, B_new, interpret: bool = False):
    from .bellman_pallas import _chunk_size

    nsteps, Lp, Bp = U.shape
    nt = nsteps + 1
    K = _chunk_size(nsteps, Lp, Bp)
    nchunks = -(-nsteps // K)
    pad = nchunks * K - nsteps
    if pad:
        U = jnp.concatenate([U, jnp.zeros((pad, Lp, Bp), U.dtype)])

    bnew = jnp.asarray(B_new, jnp.int32).reshape(1, 1)
    ntp = -(-nt // 128) * 128
    kernel = functools.partial(_bt_kernel, nt=nt, K=K)
    idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, ntp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # U stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K, Lp, Bp), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bnew, phi0.astype(jnp.float32), btilde, U)
    level_idx = idx[0, :nt]
    levels = jnp.asarray(levels)
    return levels[level_idx], level_idx


@functools.lru_cache(maxsize=None)
def _cv_backtrack(interpret: bool):
    """custom_vmap wrapper: jax.vmap of the fused backtrack dispatches to the
    (bit-identical) vmapped XLA-scan backtrack."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(U, phi0, btilde, levels, B_new):
        return _backtrack_impl(U, phi0, btilde, levels, B_new, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, U, phi0, btilde, levels, B_new):
        from .bellman import backtrack

        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(backtrack, in_axes=in_axes)(U, phi0, btilde, levels, B_new)
        return out, (True, True)

    return fn


@functools.partial(jax.jit, static_argnames=("interpret",))
def backtrack_pallas(U, phi0, btilde, levels, B_new, interpret: bool = False):
    """Drop-in device-side replacement for :func:`bellman.backtrack` on the
    padded tables produced by :func:`bellman_pallas.build_tables_pallas`.

    Returns ``(u, level_idx)`` like the scan version.  Supports ``jax.vmap``
    (falls back to the equivalent vmapped scan backtrack).
    """
    return _cv_backtrack(interpret)(U, phi0, btilde, levels, B_new)
