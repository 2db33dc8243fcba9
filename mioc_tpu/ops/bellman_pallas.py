"""Pallas TPU kernel for the Bellman DP backward sweep.

The XLA-scan path in :mod:`.bellman` dispatches ~10 small vector ops per time
step; for the bundled problem sizes (L ≤ 36, B ≤ 256) each step's arithmetic
is microseconds of VPU work, so per-op overhead dominates.  This kernel fuses
the ENTIRE backward recursion into one ``pallas_call``:

  * the value table Φ ``(Lp, Bp)`` lives in VMEM for the whole sweep
    (budget on the 128-wide lanes, level combinations on sublanes);
  * the tropical contraction ``min_j (Φ[j, b] + jump[l, j])`` is an unrolled
    loop over the L successor combinations of fully vectorized lane ops,
    tracking the running argmin;
  * the data-dependent budget shift is a select over ``smax+1`` static lane
    rotations (see :mod:`.bellman` module docs);
  * the per-step argmin plane ``U_i`` is double-buffered in VMEM and streamed
    to HBM with async DMA overlapped with the next step's compute.

Returns the same (padded) tables the scan path produces; ``backtrack`` from
:mod:`.bellman` consumes them unchanged (padded level rows hold +inf and are
never selected).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_tables_pallas", "pallas_supported"]

_INF = np.float32(np.inf)  # numpy scalar: a static constant inside kernels


def _round_up(x, m):
    return ((x + m - 1) // m) * m


_CHUNK_KIB = int(__import__("os").environ.get("MIOC_PALLAS_CHUNK_KIB", 2048))

# U-table element dtype.  The argmin index fits int8 whenever L ≤ 127
# (every bundled problem: L ≤ 36), and U is BY FAR the DP pair's dominant
# HBM traffic — the build streams it out and every chase streams it back
# (×32 fishing: 268 MB per batched chase, measured at 87% of the HBM bound
# and 47% of total multistart device time, round-5 xplane profile).  int8
# cuts that 4×.  MIOC_U_DTYPE=int32 restores the round-4 layout for A/B.
_U_INT8 = __import__("os").environ.get("MIOC_U_DTYPE", "int8") == "int8"


def _u_dtype(L: int):
    return jnp.int8 if (_U_INT8 and L <= 127) else jnp.int32


# Build-kernel variant knob — census instrumentation for the SoL
# attribution (VERDICT r4 item 4; benchmarks/dp_census.py).  Read once at
# import; one process per variant.
#   "auto"       — default: "jb" when Lp ≤ 16 (census: 1.72× at the conv
#                  shape, where the per-j jump-column broadcast
#                  materializations dominate the contraction), else "full"
#                  (at heat's Lp=40 the hoisted-plane loads measured 1.18×
#                  SLOWER than the broadcasts);
#   "full"       — in-loop jump-column broadcasts;
#   "jb"         — per-j jump-column lane broadcasts (Lp, 1) → (Lp, Bp)
#                  hoisted OUT of the time loop into a precomputed
#                  (L, Lp, Bp) operand streamed from XLA (exact);
#   "nocontract" — ablation: skip the min-plus contraction (census only);
#   "noshift"    — ablation: skip the budget-shift select chain (census
#                  only; both ablations produce garbage tables).
_DP_VARIANT = __import__("os").environ.get("MIOC_DP_VARIANT", "auto")


def _pick_variant(Lp: int) -> str:
    if _DP_VARIANT == "auto":
        return "jb" if Lp <= 16 else "full"
    return _DP_VARIANT


def _chunk_size(nsteps: int, Lp: int, Bp: int, S: int = 1,
                itemsize: int = 4) -> int:
    """U-streaming chunk length: ≤ ~2 MB per double-buffer slot (tunable via
    MIOC_PALLAS_CHUNK_KIB), floored to a power of two so every kernel over
    the same tables (build, batched chase) computes K | 64 and stays within
    the shared raw padded time axis (``_tpad``).  ``itemsize`` follows the
    U dtype: int8 tables fit 4× more steps per slot, which quarters the
    chase's per-chunk DMA waits (at ×32 fishing the int32 chunk was 8 steps
    — a wait every 8 sequential pointer steps)."""
    K = max(1, min(64, nsteps, (_CHUNK_KIB << 10) // (S * Lp * Bp * itemsize)))
    return 1 << (K.bit_length() - 1)


def _tpad(nsteps: int) -> int:
    """Raw U time-axis padding: the fixed multiple-of-64 length that bounds
    ``ceil(nsteps/K)*K`` for every power-of-two ``K ≤ 64`` — so tables built
    with one chunk size can be chased with another without re-padding."""
    return -(-nsteps // 64) * 64


def _pad_operands(stage, btilde, jump_cost, L: int, Lp: int, Bp: int):
    """Pad the level axis to ``Lp`` (inf stage / inert btilde / inf jump
    columns) — shared by the single and batched builds; leading batch
    dimensions pass through."""
    stage_p = jnp.full(stage.shape[:-1] + (Lp,), _INF, jnp.float32)
    stage_p = stage_p.at[..., :L].set(stage.astype(jnp.float32))
    btilde_p = jnp.full(btilde.shape[:-1] + (Lp,), Bp + 1, jnp.int32)
    btilde_p = btilde_p.at[..., :L].set(btilde)
    jump_p = jnp.full((Lp, Lp), _INF, jnp.float32).at[:L, :L].set(
        jump_cost.astype(jnp.float32)
    )
    return stage_p, btilde_p, jump_p


def pallas_supported() -> bool:
    """True when a TPU backend is available for the compiled kernel."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _dp_kernel(
    stage_ref,    # (nt, Lp) f32, VMEM
    btilde_ref,   # (nt, Lp) i32, VMEM
    jump_ref,     # (Lp, Lp) f32, VMEM — OR (L, Lp, Bp) broadcast planes ("jb")
    U_hbm_ref,    # out 0: (nchunks*K, Lp, Bp) i32, HBM (streamed per chunk)
    phi0_ref,     # out 1: (Lp, Bp) f32, VMEM
    u_buf_ref,    # scratch: (2, K, Lp, Bp) i32 — double-buffered chunk
    send_sem,     # DMA semaphores (2,)
    *,
    nt: int,
    L: int,
    smax: int,
    K: int,
    unroll: int = 1,
    variant: str = "full",
):
    Lp, Bp = phi0_ref.shape
    b_lane = jax.lax.broadcasted_iota(jnp.int32, (Lp, Bp), 1)
    nsteps = nt - 1

    stage_at = lambda i: stage_ref[i, :]
    btilde_at = lambda i: btilde_ref[i, :]
    U_at = lambda sl: U_hbm_ref.at[sl]
    phi0_out = phi0_ref

    # Terminal layer i = nt-1: Φ[l, b] = stage if b == b̃ else +inf.
    # Φ is a LOOP CARRY (vregs), not a VMEM scratch: the per-step work is a
    # short dependency chain on a tiny plane (conv: (8, 256) = 2 vregs), so
    # the kernel is latency-bound — a VMEM store+load round trip per step
    # sits squarely on that chain.
    phi_init = jnp.where(
        b_lane == btilde_at(nt - 1)[:, None],
        stage_at(nt - 1)[:, None],
        _INF,
    )

    def step(i, slot, row, phi):  # one backward step at time index i
        # Tropical contraction with running argmin over successor j (< L).
        if variant == "nocontract":  # ablation: no j-loop (census only)
            val, arg = phi, jnp.zeros((Lp, Bp), jnp.int32)
        elif variant == "jb":
            # Jump-column broadcasts hoisted: jump_ref here is the
            # precomputed (L, Lp, Bp) planes jump_b[j, l, :] = jump[l, j].
            val = phi[0, :][None, :] + jump_ref[0]
            arg = jnp.zeros((Lp, Bp), jnp.int32)
            for j in range(1, L):
                cand = phi[j, :][None, :] + jump_ref[j]
                better = cand < val
                val = jnp.where(better, cand, val)
                arg = jnp.where(better, j, arg)
        else:
            val = phi[0, :][None, :] + jump_ref[:, 0][:, None]
            arg = jnp.zeros((Lp, Bp), jnp.int32)
            for j in range(1, L):
                cand = phi[j, :][None, :] + jump_ref[:, j][:, None]
                better = cand < val
                val = jnp.where(better, cand, val)
                arg = jnp.where(better, j, arg)

        # Budget shift: out[l, b] = val[l, b − b̃_l] via static lane
        # rotations.  Note: a PRE-shift U (dropping the arg half of this
        # chain) was measured in round 5 — build −⅓ shift ops, but the
        # chase's pointer recurrence serializes and chases dominate the TRM
        # loop 7:1, so post-shift stays (benchmarks/dp_census.py notes).
        if variant == "noshift":  # ablation: no shift chain (census only)
            new_phi, new_arg = val, arg
        else:
            btilde_i = btilde_at(i)[:, None]  # (Lp, 1)
            new_phi = jnp.full((Lp, Bp), _INF)
            new_arg = jnp.zeros((Lp, Bp), jnp.int32)
            for s in range(smax + 1):
                v = pltpu.roll(val, s, 1) if s else val
                a = pltpu.roll(arg, s, 1) if s else arg
                sel = (btilde_i == s) & (b_lane >= s)
                new_phi = jnp.where(sel, v, new_phi)
                new_arg = jnp.where(sel, a, new_arg)

        phi_next = stage_at(i)[:, None] + new_phi
        # Chunked streaming: K argmin planes are buffered in VMEM and
        # flushed with ONE DMA per chunk (double-buffered); the DMA
        # wait/flush bookkeeping lives in the per-CHUNK driver below —
        # round 5 measured per-step `pl.when` branches at ~hundreds of
        # scalar-core cycles each, which was most of the build's missing
        # ~2× vs its vector-op model (benchmarks/dp_census.py).
        u_buf_ref[slot, row] = new_arg.astype(u_buf_ref.dtype)
        return phi_next

    # Chunk-major backward sweep: chunks c = nchunks-1 … 0, rows r = K-1 … 0
    # (i = c·K + r decreasing throughout).  Per chunk: one wait for the
    # slot's outstanding flush, a BRANCHLESS manually-unrolled row loop
    # (Mosaic supports only unroll=1/full in lax loops), one flush DMA.
    nchunks = -(-nsteps // K)
    rem_t = nsteps - (nchunks - 1) * K  # rows in the first-swept (top) chunk
    U_ = max(1, min(unroll, K))

    def rows_desc(c, slot, nrows, phi):
        # nrows is static; process rows nrows-1 … 0 of chunk c.
        nsuper = nrows // U_

        def sstep(s, phi):
            for t in range(U_):
                r = nrows - 1 - (s * U_ + t)
                phi = step(c * K + r, slot, r, phi)
            return phi

        phi = jax.lax.fori_loop(0, nsuper, sstep, phi, unroll=False)
        for t in range(nrows - nsuper * U_):  # static leftover (smallest r)
            r = nrows - nsuper * U_ - 1 - t
            phi = step(c * K + r, slot, r, phi)
        return phi

    def flush(c, slot):
        pltpu.make_async_copy(
            u_buf_ref.at[slot], U_at(pl.ds(c * K, K)), send_sem.at[slot]
        ).start()

    phi = phi_init
    if nchunks == 0:  # nt == 1: terminal layer only
        phi0_out[:] = phi
        return
    # Top (possibly partial) chunk — static index, no outstanding DMA yet.
    c_top = nchunks - 1
    phi = rows_desc(c_top, c_top % 2, rem_t, phi)
    flush(c_top, c_top % 2)

    def chunk_body(ci, phi):
        c = nchunks - 1 - ci
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 2 <= nchunks - 1)
        def _():  # reuse: wait for this slot's previous flush (chunk c+2)
            pltpu.make_async_copy(
                u_buf_ref.at[slot], U_at(pl.ds((c + 2) * K, K)),
                send_sem.at[slot],
            ).wait()

        phi = rows_desc(c, slot, K, phi)
        flush(c, slot)
        return phi

    phi = jax.lax.fori_loop(1, nchunks, chunk_body, phi, unroll=False)
    phi0_out[:] = phi

    # Drain the last two outstanding chunk DMAs (chunks 0 and 1).
    for chunk in range(min(2, (nsteps + K - 1) // K)):
        pltpu.make_async_copy(
            u_buf_ref.at[chunk % 2],
            U_at(pl.ds(chunk * K, K)),
            send_sem.at[chunk % 2],
        ).wait()


def _dp_kernel_batched(
    stage_ref,    # (nt, S, Lp) f32, VMEM — time-major for per-step reads
    btilde_ref,   # (nt, S, Lp) i32, VMEM
    jump_ref,     # (Lp, Lp) f32, VMEM (shared across the batch)
    U_hbm_ref,    # out 0: (S, nchunks*K, Lp, Bp) i32, HBM
    phi0_ref,     # out 1: (S, Lp, Bp) f32, VMEM
    phi_ref,      # scratch: (S, Lp, Bp) f32 — ALL starts' value tables
    u_buf_ref,    # scratch: (2, S, K, Lp, Bp) i32 — double-buffered chunk
    send_sem,     # DMA semaphores (2,)
    *,
    nt: int,
    L: int,
    smax: int,
    K: int,
    unroll: int = 1,
    variant: str = "full",
):
    """Batched fused DP build with the start axis INSIDE the kernel: every
    vector op processes all S starts at once ((S·Lp) sublanes × Bp lanes)
    instead of running a sequential grid (the round-1 design, which lost to
    the XLA-scan path on multistart — VERDICT round 1, item 2)."""
    S, Lp, Bp = phi_ref.shape
    b_lane = jax.lax.broadcasted_iota(jnp.int32, (S, Lp, Bp), 2)
    nsteps = nt - 1

    # Terminal layer i = nt-1 for every start.
    phi_ref[:] = jnp.where(
        b_lane == btilde_ref[nt - 1][:, :, None],
        stage_ref[nt - 1][:, :, None],
        _INF,
    )

    def step(i, slot, row, _):  # one backward step at time index i
        phi = phi_ref[:]

        # Tropical contraction with running argmin over successor j (< L).
        if variant == "jb":
            # Hoisted jump planes (see _dp_kernel): jump_ref is (L, Lp, Bp).
            val = phi[:, 0, :][:, None, :] + jump_ref[0][None]
            arg = jnp.zeros((S, Lp, Bp), jnp.int32)
            for j in range(1, L):
                cand = phi[:, j, :][:, None, :] + jump_ref[j][None]
                better = cand < val
                val = jnp.where(better, cand, val)
                arg = jnp.where(better, j, arg)
        else:
            val = phi[:, 0, :][:, None, :] + jump_ref[:, 0][None, :, None]
            arg = jnp.zeros((S, Lp, Bp), jnp.int32)
            for j in range(1, L):
                cand = phi[:, j, :][:, None, :] + jump_ref[:, j][None, :, None]
                better = cand < val
                val = jnp.where(better, cand, val)
                arg = jnp.where(better, j, arg)

        # Budget shift via static lane rotations (per-start b̃).
        btilde_i = btilde_ref[i][:, :, None]  # (S, Lp, 1)
        new_phi = jnp.full((S, Lp, Bp), _INF)
        new_arg = jnp.zeros((S, Lp, Bp), jnp.int32)
        for s in range(smax + 1):
            v = pltpu.roll(val, s, 2) if s else val
            a = pltpu.roll(arg, s, 2) if s else arg
            sel = (btilde_i == s) & (b_lane >= s)
            new_phi = jnp.where(sel, v, new_phi)
            new_arg = jnp.where(sel, a, new_arg)

        phi_ref[:] = stage_ref[i][:, :, None] + new_phi
        # DMA bookkeeping lives in the per-CHUNK driver (see _dp_kernel —
        # per-step `pl.when` branches were most of the builds' missing ~2×).
        u_buf_ref[slot, :, row] = new_arg.astype(u_buf_ref.dtype)
        return ()

    # Chunk-major backward sweep (see _dp_kernel): chunks nchunks-1 … 0,
    # rows K-1 … 0, branchless manually-unrolled row loops, one wait + one
    # flush DMA per chunk.
    nchunks = -(-nsteps // K)
    rem_t = nsteps - (nchunks - 1) * K if nchunks else 0
    U_ = max(1, min(unroll, K))

    def rows_desc(c, slot, nrows):
        nsuper = nrows // U_

        def sstep(s, _):
            for t in range(U_):
                r = nrows - 1 - (s * U_ + t)
                step(c * K + r, slot, r, ())
            return ()

        jax.lax.fori_loop(0, nsuper, sstep, (), unroll=False)
        for t in range(nrows - nsuper * U_):  # static leftover (smallest r)
            r = nrows - nsuper * U_ - 1 - t
            step(c * K + r, slot, r, ())

    def flush(c, slot):
        pltpu.make_async_copy(
            u_buf_ref.at[slot], U_hbm_ref.at[:, pl.ds(c * K, K)],
            send_sem.at[slot],
        ).start()

    if nchunks:
        c_top = nchunks - 1
        rows_desc(c_top, c_top % 2, rem_t)
        flush(c_top, c_top % 2)

        def chunk_body(ci, _):
            c = nchunks - 1 - ci
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 2 <= nchunks - 1)
            def _():  # reuse: wait for this slot's previous flush (c+2)
                pltpu.make_async_copy(
                    u_buf_ref.at[slot],
                    U_hbm_ref.at[:, pl.ds((c + 2) * K, K)],
                    send_sem.at[slot],
                ).wait()

            rows_desc(c, slot, K)
            flush(c, slot)
            return ()

        jax.lax.fori_loop(1, nchunks, chunk_body, (), unroll=False)

    for chunk in range(min(2, (nsteps + K - 1) // K)):
        pltpu.make_async_copy(
            u_buf_ref.at[chunk % 2],
            U_hbm_ref.at[:, pl.ds(chunk * K, K)],
            send_sem.at[chunk % 2],
        ).wait()

    phi0_ref[:] = phi_ref[:]


def _build_tables_impl(stage, btilde, jump_cost, B: int, smax: int,
                       interpret: bool = False, raw_u: bool = False,
                       unroll: int = 4):
    nt, L = stage.shape
    Lp = _round_up(max(L, 8), 8)
    Bp = _round_up(B + 1, 128)
    stage_p, btilde_p, jump_p = _pad_operands(stage, btilde, jump_cost, L, Lp, Bp)

    nsteps = nt - 1
    udt0 = _u_dtype(L)
    K = _chunk_size(nsteps, Lp, Bp, itemsize=jnp.dtype(udt0).itemsize)

    variant = _pick_variant(Lp)
    if variant == "jb":
        # Hoisted jump-broadcast planes: one XLA broadcast per build.
        jump_p = jnp.broadcast_to(jump_p.T[:L, :, None], (L, Lp, Bp))

    udt = udt0
    kernel = functools.partial(_dp_kernel, nt=nt, L=L, smax=min(smax, B), K=K,
                               unroll=unroll, variant=variant)
    U, phi0 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((_tpad(nsteps), Lp, Bp), udt),
            jax.ShapeDtypeStruct((Lp, Bp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),   # U stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, K, Lp, Bp), udt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(stage_p, btilde_p, jump_p)
    return (U if raw_u else U[:nsteps]), phi0


@functools.lru_cache(maxsize=None)
def _cv_build(B: int, smax: int, interpret: bool, raw_u: bool = False):
    """custom_vmap wrapper: jax.vmap of the fused build dispatches to the
    batched (grid-over-batch) kernel instead of failing to batch pallas_call."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def fn(stage, btilde, jump_cost):
        return _build_tables_impl(stage, btilde, jump_cost, B, smax, interpret,
                                  raw_u)

    @fn.def_vmap
    def _rule(axis_size, in_batched, stage, btilde, jump_cost):
        sb, bb, jb = in_batched
        if jb:
            # Batched jump table (different β per element): sequential map.
            out = jax.lax.map(
                lambda args: _build_tables_impl(*args, B, smax, interpret,
                                                raw_u),
                (stage, btilde, jump_cost),
            )
            return out, (True, True)
        if not sb:
            stage = jnp.broadcast_to(stage[None], (axis_size,) + stage.shape)
        if not bb:
            btilde = jnp.broadcast_to(btilde[None], (axis_size,) + btilde.shape)
        out = build_tables_pallas_batched(stage, btilde, jump_cost, B, smax,
                                          interpret, raw_u=raw_u)
        return out, (True, True)

    return fn


@functools.partial(jax.jit, static_argnames=("B", "smax", "interpret", "raw_u"))
def build_tables_pallas(stage, btilde, jump_cost, B: int, smax: int,
                        interpret: bool = False, raw_u: bool = False):
    """Fused-kernel equivalent of :func:`mioc_tpu.ops.bellman.build_tables`.

    Returns ``(U, phi0)`` with padded shapes ``(nt-1, Lp, Bp)`` / ``(Lp, Bp)``
    where ``Lp = roundup(L, 8)``, ``Bp = roundup(B+1, 128)``; padded level
    rows hold ``+inf`` in ``phi0`` and are never selected by ``backtrack``.
    Supports ``jax.vmap`` via the batched grid kernel.

    ``raw_u=True`` keeps U's time axis at the kernel's DMA padding
    (``_tpad(nt-1)``, a multiple of 64) instead of slicing to ``nt-1`` —
    the layout the fused backtrack kernels chase in place, sparing the
    ~0.6 ms/build slice-copy XLA otherwise materializes inside the TRM loop.
    """
    return _cv_build(B, min(smax, B), interpret, raw_u)(stage, btilde,
                                                        jump_cost)


@functools.partial(jax.jit,
                   static_argnames=("B", "smax", "interpret", "unroll",
                                    "raw_u"))
def build_tables_pallas_batched(stage, btilde, jump_cost, B: int, smax: int,
                                interpret: bool = False, unroll: int = 4,
                                raw_u: bool = False):
    """Batched fused DP build with the start axis inside ONE kernel
    invocation: Φ for all ``S`` starts lives in VMEM as ``(S, Lp, Bp)`` and
    every vector op advances the whole batch (``(S·Lp)`` sublanes × ``Bp``
    lanes), instead of the round-1 sequential grid.

    ``stage``/``btilde`` are ``(S, nt, L)``; ``jump_cost`` is shared.  Returns
    ``(U (S, nt-1, Lp, Bp), phi0 (S, Lp, Bp))``.  This is the batching rule
    behind ``jax.vmap(build_tables_pallas)`` — e.g. the vmapped device TRM.
    """
    S, nt, L = stage.shape
    Lp = _round_up(max(L, 8), 8)
    Bp = _round_up(B + 1, 128)
    stage_p, btilde_p, jump_p = _pad_operands(stage, btilde, jump_cost, L, Lp, Bp)
    # Time-major layout: the kernel reads one (S, Lp) plane per step.
    stage_p = stage_p.transpose(1, 0, 2)
    btilde_p = btilde_p.transpose(1, 0, 2)

    nsteps = nt - 1
    udt = _u_dtype(L)
    K = _chunk_size(nsteps, Lp, Bp, S, itemsize=jnp.dtype(udt).itemsize)

    # Batched build keeps the in-loop broadcasts: hoisted jump planes need
    # an extra broadcast over S here and measured 14.03 → 15.99 ms/solve at
    # ×32 fishing (round 5) — "jb" is a SINGLE-build win only (explicit
    # MIOC_DP_VARIANT=jb still forces it for experiments).
    variant = "jb" if _DP_VARIANT == "jb" else "full"
    if variant == "jb":
        jump_p = jnp.broadcast_to(jump_p.T[:L, :, None], (L, Lp, Bp))

    kernel = functools.partial(
        _dp_kernel_batched, nt=nt, L=L, smax=min(smax, B), K=K, unroll=unroll,
        variant=variant,
    )
    U, phi0 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((S, _tpad(nsteps), Lp, Bp), udt),
            jax.ShapeDtypeStruct((S, Lp, Bp), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),   # U stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, Lp, Bp), jnp.float32),
            pltpu.VMEM((2, S, K, Lp, Bp), udt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(stage_p, btilde_p, jump_p)
    return (U if raw_u else U[:, :nsteps]), phi0
