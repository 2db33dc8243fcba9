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

__all__ = ["backtrack_pallas", "backtrack_pallas_trials"]

_INF = np.float32(np.inf)
_BIG = np.int32(2**30)


def _levels_at(levels, level_idx):
    """``levels[level_idx]`` without the gather.  XLA lowers the row gather
    from the tiny ``(L, M)`` table to a slow dynamic-gather fusion on TPU
    (measured ~50 µs per ×32 chase — as long as the chase's own DMA wait
    chain); a one-hot contraction does the same lookup as dense MXU/VPU
    work.  Bit-exact: exactly one unit term per row, level values are small
    integers (exact in every MXU pass precision), and adding zeros does not
    change f32 bits."""
    levels = jnp.asarray(levels)
    L = levels.shape[0]
    oh = (level_idx[..., None] == jnp.arange(L, dtype=jnp.int32)
          ).astype(levels.dtype)
    return oh @ levels


def _bt_kernel(
    bnew_ref,     # (1, 1) i32, SMEM
    phi0_ref,     # (Lp, Bp) f32, VMEM
    btilde_ref,   # (nt, Lp) i32, VMEM
    U_hbm_ref,    # (nsteps_pad, Lp, Bp) i32, HBM
    idx_ref,      # out: (1, ntp) i32, VMEM row (per-step scalar stores are
                  #   not allowed on TPU, and an SMEM output of nt scalars
                  #   blows the 1 MB SMEM budget)
    u_buf_ref,    # scratch: (2, K, Lp, Bp) U-dtype — DMA landing buffer
    u32_ref,      # scratch: (K, Lp, Bp) i32 — current chunk, converted.
                  #   int8 U packs 4 rows per sublane cell, so the dynamic
                  #   SUBLANE slice below cannot be proven aligned on the
                  #   raw buffer ("index in dimension 2 is a multiple of 8"
                  #   — Mosaic); converting the whole chunk once per K steps
                  #   keeps the proven-fast slice path and moves conversion
                  #   off the per-step chain.
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
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, Bp), 1)
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

    # BRANCHLESS step body + per-chunk outer loop (see _bt_kernel_batched
    # for the rationale: per-step `pl.when`s cost ~hundreds of scalar-core
    # cycles and dominated the chase kernels).
    def step_at(k, r, carry):
        l, b = carry
        # Dynamic LANE extraction is not allowed on TPU, but dynamic SUBLANE
        # slicing is (probed on-chip, round 3): pull row l of the plane with
        # a dynamic slice, then select lane b with a (1, Bp) masked reduce —
        # ~5 small vector ops vs the full-plane (Lp, Bp) masked reduction
        # this replaced.  The slice reads the chunk-converted i32 copy (see
        # u32_ref).  Lookup at b BEFORE the decrement (post-shift U): the
        # bt reduce and the row lookup run in PARALLEL off the recurrence —
        # the pre-shift form serialized them and cost the chase +75%
        # (round-5 measurement).
        row_vec = u32_ref[r, pl.ds(l, 1)]  # (1, Bp)
        l_next = jnp.max(jnp.where(lane_row == b, row_vec, 0))
        bt_row = btilde_ref[pl.ds(k, 1), :]  # (1, L) — btilde may be unpadded
        bt_iota = jax.lax.broadcasted_iota(jnp.int32, bt_row.shape, 1)
        bt_l = jnp.max(jnp.where(bt_iota == l, bt_row, 0))
        b_next = b - bt_l  # decrement AFTER lookup

        # Write-through idx staging (branchless; see _bt_kernel_batched).
        p = k + 1
        out_chunk = p // 128
        out_row = p - out_chunk * 128
        buf = jnp.where(t128 == out_row, l_next, idx_buf_ref[:])
        buf = jnp.where((out_row == 0) & (t128 != 0), 0, buf)
        idx_buf_ref[:] = buf
        idx_ref[:, pl.ds(out_chunk * 128, 128)] = buf
        return (l_next, b_next)

    nfull = nsteps // K
    rem = nsteps - nfull * K

    def chunk_body(c, carry):
        slot = jax.lax.rem(c, 2)
        pltpu.make_async_copy(
            U_hbm_ref.at[pl.ds(c * K, K)], u_buf_ref.at[slot], sem.at[slot]
        ).wait()
        u32_ref[:] = u_buf_ref[slot].astype(jnp.int32)
        carry = jax.lax.fori_loop(
            0, K, lambda r, cy: step_at(c * K + r, r, cy), carry)

        @pl.when(c + 2 <= nchunks - 1)
        def _():  # prefetch AFTER this chunk's reads (slot reuse)
            start_chunk(c + 2)

        return carry

    carry = jax.lax.fori_loop(0, nfull, chunk_body, (l0, b0))
    if rem:  # final partial chunk (static trip count)
        slot = nfull % 2
        pltpu.make_async_copy(
            U_hbm_ref.at[pl.ds(nfull * K, K)], u_buf_ref.at[slot],
            sem.at[slot],
        ).wait()
        u32_ref[:] = u_buf_ref[slot].astype(jnp.int32)
        jax.lax.fori_loop(
            0, rem, lambda r, cy: step_at(nfull * K + r, r, cy), carry)


def _allreduce_max_lanes(x, width: int):
    """Cyclic roll + max tree: every lane ends up holding the global max of
    the ``width`` lanes (power of two) — a lane BROADCAST of a reduction
    without the vector→scalar→vector round trip (Mosaic implements neither
    a cheap scalar extract nor a (1,1)-vreg lane broadcast)."""
    s = 1
    while s < width:
        x = jnp.maximum(x, pltpu.roll(x, s, 1))
        s *= 2
    return x


def _bt_kernel_vec(
    bnew_ref,     # (1, 1) i32, SMEM
    phi0_ref,     # (Lp, Bp) f32, VMEM
    btilde_ref,   # (nt, Bp) i32, VMEM — level axis PADDED to Bp lanes
    U_hbm_ref,    # (nsteps_pad, Lp, Bp) i32, HBM
    idx_ref,      # out: (1, ntp) i32, VMEM
    u_buf_ref,    # scratch: (2, K, Lp, Bp) U-dtype
    u32_ref,      # scratch: (K, Lp, Bp) i32 — unused here (full-plane reads
                  #   convert inline); shared scratch list with _bt_kernel
    idx_buf_ref,  # scratch: (1, 128) i32
    sem,          # DMA semaphores (2,)
    *,
    nt: int,
    K: int,
    L: int,
):
    """Chase with LANE-BROADCAST vector state: ``(l, b)`` live as (1, Bp)
    vectors with every lane equal.  The scalar-carry kernel pays two
    vector→scalar reductions plus a dynamic-sublane slice per step — ~236
    cycles/step of chain (513.8 µs at conv nt=2048, more than the build it
    follows).  Here the row select is ``L`` statically-unrolled elementwise
    selects against the broadcast ``l`` and both lookups finish with a
    log₂(Bp) roll+max all-reduce whose result is ALREADY broadcast — the
    chain never leaves the VPU's vector lanes.  MEASURED NEGATIVE: the
    roll+max chains cost more than the crossings they remove (conv chase
    1205.9 vs 513.8 µs) — kept behind MIOC_CHASE=vec as the documented
    third strike on chase latency (BASELINE_SELF.md round 4)."""
    Lp, Bp = phi0_ref.shape
    nsteps = nt - 1
    nchunks = -(-nsteps // K)
    b_lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, Bp), 1)
    l_sub = jax.lax.broadcasted_iota(jnp.int32, (Lp, Bp), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, Bp), 1)
    t128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    zero_row = jnp.zeros((1, Bp), jnp.int32)

    # Seed argmin (reference column-major order) — one-time scalar path,
    # then broadcast into the vector carry via supported scalar broadcasts.
    masked = jnp.where(b_lane <= bnew_ref[0, 0], phi0_ref[:], _INF)
    mval = jnp.min(masked)
    lin = jnp.where(masked == mval, l_sub * Bp + b_lane, _BIG)
    pick = jnp.min(lin)
    l0 = zero_row + pick // Bp            # (1, Bp), all lanes equal
    b0 = zero_row + (pick - (pick // Bp) * Bp)
    idx_buf_ref[:] = jnp.where(t128 == 0, l0[:, :128],
                               jnp.zeros((1, 128), jnp.int32))

    def start_chunk(c):
        pltpu.make_async_copy(
            U_hbm_ref.at[pl.ds(c * K, K)], u_buf_ref.at[c % 2], sem.at[c % 2]
        ).start()

    start_chunk(0)
    if nchunks > 1:
        start_chunk(1)

    def step(k, carry):
        l, b = carry  # (1, Bp) broadcast vectors
        chunk = k // K
        row = k - chunk * K
        slot = jax.lax.rem(chunk, 2)

        @pl.when(row == 0)
        def _():
            pltpu.make_async_copy(
                U_hbm_ref.at[pl.ds(chunk * K, K)], u_buf_ref.at[slot],
                sem.at[slot],
            ).wait()

        plane = u_buf_ref[slot, row].astype(jnp.int32)  # (Lp, Bp)
        rowv = jnp.where(l == 0, plane[0:1, :], zero_row)
        for j in range(1, L):
            rowv = jnp.where(l == j, plane[j:j + 1, :], rowv)
        l_next = _allreduce_max_lanes(
            jnp.where(lane_row == b, rowv, zero_row), Bp)
        # Budget decrement: btilde row padded to Bp lanes, same machinery.
        bt_row = btilde_ref[pl.ds(k, 1), :]        # (1, Bp)
        bt_l = _allreduce_max_lanes(
            jnp.where(lane_row == l, bt_row, zero_row), Bp)
        b_next = b - bt_l  # decrement AFTER lookup

        p = k + 1
        out_chunk = p // 128
        out_row = p - out_chunk * 128

        @pl.when(out_row == 0)
        def _():
            idx_ref[:, pl.ds((out_chunk - 1) * 128, 128)] = idx_buf_ref[:]
            idx_buf_ref[:] = jnp.zeros((1, 128), jnp.int32)

        idx_buf_ref[:] = jnp.where(t128 == out_row, l_next[:, :128],
                                   idx_buf_ref[:])

        @pl.when((row == K - 1) & (chunk + 2 <= nchunks - 1))
        def _():
            pltpu.make_async_copy(
                U_hbm_ref.at[pl.ds((chunk + 2) * K, K)],
                u_buf_ref.at[slot],
                sem.at[slot],
            ).start()

        return (l_next, b_next)

    jax.lax.fori_loop(0, nsteps, step, (l0, b0))
    idx_ref[:, pl.ds((nsteps // 128) * 128, 128)] = idx_buf_ref[:]


def _bt_kernel_batched(
    bnew_ref,     # (S, 1) i32, VMEM — per-start budget cap (traced halvings)
    phi0_ref,     # (S, Lp, Bp) f32, VMEM
    btilde_ref,   # (nt, S, L) i32, VMEM — time-major, unpadded level axis
    U_hbm_ref,    # (S, Tp, Lp, Bp) i32, HBM; Tp ≥ ceil(nsteps/K)·K
    idx_ref,      # out: (S, ntp) i32, VMEM
    u_buf_ref,    # scratch: (2, S, K, Lp, Bp) i32 — double-buffered prefetch
    idx_buf_ref,  # scratch: (S, 128) i32 — staging rows (see _bt_kernel)
    sem,          # DMA semaphores (2,)
    *,
    nt: int,
    K: int,
):
    """Batched path chase: all S starts advance in lockstep vector ops
    ((S·Lp) sublanes × Bp lanes), replacing the vmapped XLA-scan backtrack
    whose 3 tiny dispatches per time step cost ~1.7 µs each — measured 1.75
    ms per chase at ×32 fishing nt=1024 vs ~0.4 ms here, and the TRM chases
    ~7× per outer iteration (halvings re-chase the same tables)."""
    S, Lp, Bp = phi0_ref.shape
    L = btilde_ref.shape[2]
    nsteps = nt - 1
    nchunks = -(-nsteps // K)
    # Mosaic implements neither sublane vector broadcasts nor combined
    # sublane+lane broadcasts, so per-start (S, 1) state NEVER meets the
    # sublane (level) axis directly: the L level rows are statically
    # unrolled (L is small and static) and each row is selected with a
    # python-int comparison — only supported lane-only broadcasts
    # ((S, 1) → (S, Bp)) remain.
    b_row = jax.lax.broadcasted_iota(jnp.int32, (S, Bp), 1)
    t128 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)

    # Per-start seed argmin in the reference's column-major order (budget
    # fastest, then combination — HelpFunctions.jl:106): smallest l among
    # rows attaining the global min, then smallest admissible b in that row.
    bmask = b_row <= bnew_ref[:]                  # (S, Bp), lane broadcast
    gmin = jnp.full((S, 1), _INF)
    rowmins, rowbs = [], []
    for j in range(L):
        masked_j = jnp.where(bmask, phi0_ref[:, j], _INF)      # (S, Bp)
        rm = jnp.min(masked_j, axis=1, keepdims=True)          # (S, 1)
        rb = jnp.min(jnp.where(masked_j == rm, b_row, _BIG),
                     axis=1, keepdims=True)                    # (S, 1)
        rowmins.append(rm)
        rowbs.append(rb)
        gmin = jnp.minimum(gmin, rm)
    l0 = jnp.full((S, 1), _BIG)
    b0 = jnp.zeros((S, 1), jnp.int32)
    for j in range(L):
        hit = (rowmins[j] == gmin) & (l0 == _BIG)  # first (smallest) l wins
        l0 = jnp.where(hit, j, l0)
        b0 = jnp.where(hit, rowbs[j], b0)
    idx_buf_ref[:] = jnp.where(t128 == 0, l0, jnp.zeros((S, 128), jnp.int32))

    def start_chunk(c, slot):
        pltpu.make_async_copy(
            U_hbm_ref.at[:, pl.ds(c * K, K)], u_buf_ref.at[slot], sem.at[slot]
        ).start()

    start_chunk(0, 0)
    if nchunks > 1:
        start_chunk(1, 1)

    # BRANCHLESS step body (round 5): per-step `pl.when`s cost ~hundreds of
    # scalar-core cycles each and dominated the chase kernels (the trials
    # kernel ran ~Kt× slower than its vector-op model from its per-trial
    # flush branches alone — xplane-verified).  The idx staging is a
    # WRITE-THROUGH: every step rewrites the current 128-block of idx_ref
    # from the staging buffer (one aligned vreg store), so no boundary
    # branch exists; the DMA wait/prefetch branches move to a per-CHUNK
    # outer loop below.
    def step_at(k, slot, r, carry):
        l, b = carry  # (S, 1) i32 each
        # Dynamic (l, b) extraction per start: statically-unrolled row
        # select (scalar compare per level — see broadcast note above),
        # then a masked lane reduction for the budget column.  The i32
        # convert (U may stream as int8 — 4× less of the traffic that put
        # this kernel at 87% of the HBM bound) is vector work off the
        # pointer-chase dependency chain.  Lookup at b BEFORE the decrement
        # (post-shift U): bt and row selects run in parallel off the
        # recurrence.
        plane = u_buf_ref[slot, :, r].astype(jnp.int32)  # (S, Lp, Bp)
        rowv = jnp.where(l == 0, plane[:, 0], 0)         # (S, Bp)
        for j in range(1, L):
            rowv = jnp.where(l == j, plane[:, j], rowv)
        l_next = jnp.max(jnp.where(b_row == b, rowv, 0),
                         axis=1, keepdims=True)          # (S, 1)
        bt_row = btilde_ref[k]  # (S, L)
        bt_l = jnp.where(l == 0, bt_row[:, :1], 0)
        for j in range(1, L):
            bt_l = jnp.where(l == j, bt_row[:, j:j + 1], bt_l)
        b_next = b - bt_l  # decrement AFTER lookup

        p = k + 1
        out_chunk = p // 128
        out_row = p - out_chunk * 128
        buf = jnp.where(t128 == out_row, l_next, idx_buf_ref[:])
        # Entering a new block (out_row == 0): stale tail positions reset.
        buf = jnp.where((out_row == 0) & (t128 != 0), 0, buf)
        idx_buf_ref[:] = buf
        idx_ref[:, pl.ds(out_chunk * 128, 128)] = buf
        return (l_next, b_next)

    nfull = nsteps // K
    rem = nsteps - nfull * K

    def chunk_body(c, carry):
        slot = jax.lax.rem(c, 2)
        pltpu.make_async_copy(
            U_hbm_ref.at[:, pl.ds(c * K, K)], u_buf_ref.at[slot], sem.at[slot]
        ).wait()
        carry = jax.lax.fori_loop(
            0, K, lambda r, cy: step_at(c * K + r, slot, r, cy), carry)

        # Prefetch into this slot only AFTER the chunk's reads (the async
        # copy overlaps the NEXT chunk's compute on the other slot).
        @pl.when(c + 2 <= nchunks - 1)
        def _():
            start_chunk(c + 2, slot)

        return carry

    carry = jax.lax.fori_loop(0, nfull, chunk_body, (l0, b0))
    if rem:  # final partial chunk (static trip count)
        slot = nfull % 2
        pltpu.make_async_copy(
            U_hbm_ref.at[:, pl.ds(nfull * K, K)], u_buf_ref.at[slot],
            sem.at[slot],
        ).wait()
        jax.lax.fori_loop(
            0, rem, lambda r, cy: step_at(nfull * K + r, slot, r, cy), carry)


def _bt_kernel_trials(
    bnew_ref,     # (S, 128) i32, VMEM — Kt budget caps per start, lane-padded
    phi0_ref,     # (S, Lp, Bp) f32, VMEM
    btilde_ref,   # (nt, S, L) i32, VMEM — time-major, unpadded level axis
    U_hbm_ref,    # (S, Tp, Lp, Bp) i32, HBM
    idx_ref,      # out: (Kt, S, ntp) i32, VMEM
    u_buf_ref,    # scratch: (2, S, K, Lp, Bp) i32 — double-buffered prefetch
    idx_buf_ref,  # scratch: (Kt, S, 128) i32 — staging rows per trial
    sem,          # DMA semaphores (2,)
    *,
    nt: int,
    K: int,
    Kt: int,
):
    """Trial-wave chase: ``Kt`` budget caps per start against ONE shared
    table set.  The speculative TRM evaluates every halving trial from the
    same DP tables (``HelpFunctions.jl:98-124`` — the reference's economics);
    chasing them as a batch axis would broadcast/materialize ``U`` ``Kt``
    times (fishing ×32: 9 × 256 MB per outer iteration).  Here the U planes
    are DMA'd once per step and ``Kt`` statically-unrolled pointer states
    advance in lockstep — per-trial results are bit-identical to
    :func:`backtrack_pallas` at each cap."""
    S, Lp, Bp = phi0_ref.shape
    L = btilde_ref.shape[2]
    nsteps = nt - 1
    nchunks = -(-nsteps // K)
    b_row = jax.lax.broadcasted_iota(jnp.int32, (S, Bp), 1)
    t128 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)

    # Per-trial seed argmin (reference column-major order — see
    # _bt_kernel_batched for the broadcast constraints shaping this code).
    seeds = []
    for t in range(Kt):
        bn = bnew_ref[:, t:t + 1]                     # (S, 1)
        bmask = b_row <= bn
        gmin = jnp.full((S, 1), _INF)
        rowmins, rowbs = [], []
        for j in range(L):
            masked_j = jnp.where(bmask, phi0_ref[:, j], _INF)
            rm = jnp.min(masked_j, axis=1, keepdims=True)
            rb = jnp.min(jnp.where(masked_j == rm, b_row, _BIG),
                         axis=1, keepdims=True)
            rowmins.append(rm)
            rowbs.append(rb)
            gmin = jnp.minimum(gmin, rm)
        l0 = jnp.full((S, 1), _BIG)
        b0 = jnp.zeros((S, 1), jnp.int32)
        for j in range(L):
            hit = (rowmins[j] == gmin) & (l0 == _BIG)
            l0 = jnp.where(hit, j, l0)
            b0 = jnp.where(hit, rowbs[j], b0)
        seeds.extend((l0, b0))
        idx_buf_ref[t] = jnp.where(t128 == 0, l0,
                                   jnp.zeros((S, 128), jnp.int32))

    def start_chunk(c, slot):
        pltpu.make_async_copy(
            U_hbm_ref.at[:, pl.ds(c * K, K)], u_buf_ref.at[slot], sem.at[slot]
        ).start()

    start_chunk(0, 0)
    if nchunks > 1:
        start_chunk(1, 1)

    # BRANCHLESS step body + per-chunk outer loop (see _bt_kernel_batched):
    # the original per-trial flush `pl.when`s put Kt scalar-core branches
    # on EVERY step and dominated the kernel ~Kt-fold (heat S=8/Kt=8/L=36:
    # 10.1 ms per wave pass, 51% of the ×8 multistart's device time —
    # round-5 xplane; the one-branch hoist alone took the solve
    # 752 → 445 ms, and this removes the remaining per-step branches).
    def step_at(k, slot, r, carry):
        plane = u_buf_ref[slot, :, r].astype(jnp.int32)  # (S, Lp, Bp)
        bt_row = btilde_ref[k]           # (S, L)
        p = k + 1
        out_chunk = p // 128
        out_row = p - out_chunk * 128

        new_carry = []
        for t in range(Kt):
            l, b = carry[2 * t], carry[2 * t + 1]
            rowv = jnp.where(l == 0, plane[:, 0], 0)
            for j in range(1, L):
                rowv = jnp.where(l == j, plane[:, j], rowv)
            l_next = jnp.max(jnp.where(b_row == b, rowv, 0),
                             axis=1, keepdims=True)
            bt_l = jnp.where(l == 0, bt_row[:, :1], 0)
            for j in range(1, L):
                bt_l = jnp.where(l == j, bt_row[:, j:j + 1], bt_l)
            new_carry.extend((l_next, b - bt_l))

            buf = jnp.where(t128 == out_row, l_next, idx_buf_ref[t])
            buf = jnp.where((out_row == 0) & (t128 != 0), 0, buf)
            idx_buf_ref[t] = buf
            idx_ref[t, :, pl.ds(out_chunk * 128, 128)] = buf

        return tuple(new_carry)

    nfull = nsteps // K
    rem = nsteps - nfull * K

    def chunk_body(c, carry):
        slot = jax.lax.rem(c, 2)
        pltpu.make_async_copy(
            U_hbm_ref.at[:, pl.ds(c * K, K)], u_buf_ref.at[slot], sem.at[slot]
        ).wait()
        carry = jax.lax.fori_loop(
            0, K, lambda r, cy: step_at(c * K + r, slot, r, cy), carry)

        @pl.when(c + 2 <= nchunks - 1)
        def _():  # prefetch AFTER this chunk's reads (slot reuse)
            start_chunk(c + 2, slot)

        return carry

    carry = jax.lax.fori_loop(0, nfull, chunk_body, tuple(seeds))
    if rem:  # final partial chunk (static trip count)
        slot = nfull % 2
        pltpu.make_async_copy(
            U_hbm_ref.at[:, pl.ds(nfull * K, K)], u_buf_ref.at[slot],
            sem.at[slot],
        ).wait()
        jax.lax.fori_loop(
            0, rem, lambda r, cy: step_at(nfull * K + r, slot, r, cy), carry)


def _backtrack_trials_impl(U, phi0, btilde, levels, B_trials,
                           interpret: bool = False):
    """Dispatch the trial-wave chase on batched padded tables
    ``U (S, T, Lp, Bp)`` with per-start budget caps ``B_trials (S, Kt)``.
    Returns ``(u (S, Kt, nt, M), level_idx (S, Kt, nt))``."""
    from .bellman_pallas import _chunk_size, _tpad

    S, T, Lp, Bp = U.shape
    Kt = B_trials.shape[1]
    if Kt > 128:
        raise ValueError("trial-wave chase supports at most 128 trials")
    nt = btilde.shape[1]
    nsteps = nt - 1
    K = _chunk_size(nsteps, Lp, Bp, S, itemsize=U.dtype.itemsize)
    need = -(-nsteps // K) * K
    if T < need:  # sliced tables: re-pad the time axis (raw ones never hit)
        U = jnp.concatenate(
            [U, jnp.zeros((S, _tpad(nsteps) - T, Lp, Bp), U.dtype)], axis=1)

    bnew = jnp.zeros((S, 128), jnp.int32).at[:, :Kt].set(
        B_trials.astype(jnp.int32))
    ntp = -(-nt // 128) * 128
    kernel = functools.partial(_bt_kernel_trials, nt=nt, K=K, Kt=Kt)
    idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Kt, S, ntp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # U stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, S, K, Lp, Bp), U.dtype),
            pltpu.VMEM((Kt, S, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bnew, phi0.astype(jnp.float32), btilde.transpose(1, 0, 2), U)
    level_idx = idx[:, :, :nt].transpose(1, 0, 2)  # (S, Kt, nt)
    return _levels_at(levels, level_idx), level_idx


@functools.lru_cache(maxsize=None)
def _cv_trials(interpret: bool):
    """custom_vmap wrapper for the trial wave: unbatched call = one table
    set (S=1); a vmap over starts dispatches ONE kernel for all S·Kt pointer
    chases with the U planes DMA'd once."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(U, phi0, btilde, levels, B_trials):
        u, idx = _backtrack_trials_impl(U[None], phi0[None], btilde[None],
                                        levels, B_trials[None], interpret)
        return u[0], idx[0]

    @fn.def_vmap
    def _rule(axis_size, in_batched, U, phi0, btilde, levels, B_trials):
        ub, pb, bb, lb, nb = in_batched
        if lb:
            args = [
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip((U, phi0, btilde, levels, B_trials),
                                in_batched)
            ]
            out = jax.lax.map(lambda t: fn(*t), tuple(args))
            return out, (True, True)

        def bc(a, batched):
            return a if batched else jnp.broadcast_to(
                a[None], (axis_size,) + a.shape)

        out = _backtrack_trials_impl(
            bc(U, ub), bc(phi0, pb), bc(btilde, bb), levels,
            bc(jnp.asarray(B_trials, jnp.int32), nb), interpret)
        return out, (True, True)

    return fn


@functools.partial(jax.jit, static_argnames=("interpret",))
def backtrack_pallas_trials(U, phi0, btilde, levels, B_trials,
                            interpret: bool = False):
    """Chase ``Kt`` budget caps against ONE padded table set:
    ``B_trials (Kt,)`` → ``(u (Kt, nt, M), level_idx (Kt, nt))``, each row
    bit-identical to ``backtrack_pallas(..., B_trials[t])``.  Under
    ``jax.vmap`` (batched multistart) all ``S·Kt`` chases run in one kernel
    invocation with the shared U planes streamed once (no ×Kt broadcast of
    the argmin tables)."""
    return _cv_trials(interpret)(U, phi0, btilde, levels,
                                 jnp.asarray(B_trials, jnp.int32))


def _backtrack_batched_impl(U, phi0, btilde, levels, B_new,
                            interpret: bool = False):
    """Dispatch the batched chase kernel on padded tables ``U (S, T, Lp, Bp)``
    (raw ``T = _tpad(nt-1)`` or sliced ``T = nt-1``), ``phi0 (S, Lp, Bp)``,
    ``btilde (S, nt, L)``, per-start traced budgets ``B_new ()`` or
    ``(S,)``."""
    from .bellman_pallas import _chunk_size, _tpad

    S, T, Lp, Bp = U.shape
    nt = btilde.shape[1]
    nsteps = nt - 1
    K = _chunk_size(nsteps, Lp, Bp, S, itemsize=U.dtype.itemsize)
    need = -(-nsteps // K) * K
    if T < need:  # sliced tables: re-pad the time axis (raw ones never hit)
        U = jnp.concatenate(
            [U, jnp.zeros((S, _tpad(nsteps) - T, Lp, Bp), U.dtype)], axis=1)

    bnew = jnp.broadcast_to(jnp.asarray(B_new, jnp.int32).reshape(-1, 1),
                            (S, 1))
    ntp = -(-nt // 128) * 128
    kernel = functools.partial(_bt_kernel_batched, nt=nt, K=K)
    idx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, ntp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # U stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, S, K, Lp, Bp), U.dtype),
            pltpu.VMEM((S, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bnew, phi0.astype(jnp.float32), btilde.transpose(1, 0, 2), U)
    level_idx = idx[:, :nt]
    return _levels_at(levels, level_idx), level_idx


# Chase-state experiments (BASELINE_SELF.md round 4): the scalar-carry
# kernel WINS.  Alternatives measured/attempted: (a) full-plane masked
# reduce (r3: 507 vs 514 µs — flat), (b) (1,1)-vreg carries (Mosaic:
# "Not implemented: Lane broadcast"), (c) the lane-broadcast roll+max
# all-reduce kernel below (conv chase 1205.9 vs 513.8 µs, heat 618.5 vs
# 262.8 — the 2·log₂(Bp) roll+max chain costs more than the two
# vector→scalar crossings it removes).  MIOC_CHASE=vec re-enables (c)
# for experiments.
_CHASE_VEC = __import__("os").environ.get("MIOC_CHASE", "scalar") == "vec"


def _backtrack_impl(U, phi0, btilde, levels, B_new, interpret: bool = False):
    from .bellman_pallas import _chunk_size

    T, Lp, Bp = U.shape
    nt = btilde.shape[0]
    nsteps = nt - 1
    K = _chunk_size(nsteps, Lp, Bp, itemsize=U.dtype.itemsize)
    nchunks = -(-nsteps // K)
    pad = nchunks * K - T
    if pad > 0:
        U = jnp.concatenate([U, jnp.zeros((pad, Lp, Bp), U.dtype)])

    bnew = jnp.asarray(B_new, jnp.int32).reshape(1, 1)
    ntp = -(-nt // 128) * 128
    if _CHASE_VEC:
        # Lane-broadcast vector-state chase — measured SLOWER than the
        # scalar carries (see _CHASE_VEC note); kept for experiments.
        btilde_p = jnp.zeros((nt, Bp), jnp.int32).at[:, :btilde.shape[1]].set(
            btilde.astype(jnp.int32))
        kernel = functools.partial(_bt_kernel_vec, nt=nt, K=K,
                                   L=btilde.shape[1])
        btilde = btilde_p
    else:
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
            pltpu.VMEM((2, K, Lp, Bp), U.dtype),
            pltpu.VMEM((K, Lp, Bp), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bnew, phi0.astype(jnp.float32), btilde, U)
    level_idx = idx[0, :nt]
    return _levels_at(levels, level_idx), level_idx


@functools.lru_cache(maxsize=None)
def _cv_batched_backtrack(interpret: bool):
    """Recursively-batchable wrapper around the batched chase kernel: an
    outer ``jax.vmap`` over an already-batched chase (e.g. the speculative
    trial wave — K trials — inside the vmapped multistart solver — S starts)
    FLATTENS the new axis into the kernel's batch axis, so arbitrary vmap
    nesting still dispatches ONE ``(S·K)``-batched kernel invocation instead
    of falling back to pallas_call's sequential grid batching."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(U, phi0, btilde, levels, B_new):
        return _backtrack_batched_impl(U, phi0, btilde, levels, B_new,
                                       interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, U, phi0, btilde, levels, B_new):
        ub, pb, bb, lb, nb = in_batched
        if lb:
            # Batched level VALUES never occur on the solver paths (the level
            # set is static per objective); keep a correct sequential map.
            args = [
                a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, b in zip((U, phi0, btilde, levels,
                                 jnp.asarray(B_new, jnp.int32)),
                                in_batched)
            ]
            out = jax.lax.map(lambda t: fn(*t), tuple(args))
            return out, (True, True)

        S2 = axis_size

        def bc(a, batched):
            return a if batched else jnp.broadcast_to(a[None], (S2,) + a.shape)

        U = bc(U, ub)                     # (S2, S, T, Lp, Bp)
        phi0 = bc(phi0, pb)               # (S2, S, Lp, Bp)
        btilde = bc(btilde, bb)           # (S2, S, nt, L)
        S = U.shape[1]
        B_new = jnp.broadcast_to(
            jnp.asarray(B_new, jnp.int32).reshape((S2, -1) if nb else (1, -1)),
            (S2, S),
        )
        out_u, out_idx = fn(
            U.reshape((S2 * S,) + U.shape[2:]),
            phi0.reshape((S2 * S,) + phi0.shape[2:]),
            btilde.reshape((S2 * S,) + btilde.shape[2:]),
            levels,
            B_new.reshape(S2 * S),
        )
        return (out_u.reshape((S2, S) + out_u.shape[1:]),
                out_idx.reshape((S2, S) + out_idx.shape[1:])), (True, True)

    return fn


@functools.lru_cache(maxsize=None)
def _cv_backtrack(interpret: bool):
    """custom_vmap wrapper: jax.vmap of the fused backtrack dispatches to the
    batched chase kernel on tile-padded tables (the vmapped device TRM), and
    to the bit-identical vmapped XLA-scan backtrack otherwise (compact
    tables, batched levels)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(U, phi0, btilde, levels, B_new):
        return _backtrack_impl(U, phi0, btilde, levels, B_new, interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, U, phi0, btilde, levels, B_new):
        ub, pb, bb, lb, nb = in_batched
        padded = U.shape[-1] % 128 == 0 and U.shape[-2] % 8 == 0
        if padded and not lb:
            if not ub:
                U = jnp.broadcast_to(U[None], (axis_size,) + U.shape)
            if not pb:
                phi0 = jnp.broadcast_to(phi0[None], (axis_size,) + phi0.shape)
            if not bb:
                btilde = jnp.broadcast_to(btilde[None],
                                          (axis_size,) + btilde.shape)
            out = _cv_batched_backtrack(interpret)(U, phi0, btilde, levels,
                                                   B_new)
            return out, (True, True)
        from .bellman import backtrack

        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(backtrack, in_axes=in_axes)(U, phi0, btilde, levels,
                                                   B_new)
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
