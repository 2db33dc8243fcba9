"""Block-banded sparse operators: the TPU-fast SpMV for the PDE sweeps.

Gather-based sparse matvecs (ELL, :mod:`.sparse_device`) lower to per-element
dynamic gathers on TPU — measured ~250× off the HBM speed-of-light on the
axon v5e (BASELINE_SELF.md).  This module removes the gathers entirely:

1. Reorder the dofs once, host-side, with reverse Cuthill-McKee: an FEM
   matrix then has bandwidth O(√N), i.e. a handful of 128-wide **block
   diagonals** (the heat mesh at 8k dofs: bandwidth 261 → 7 block diagonals).
2. Pack the matrix into dense ``blocks (R, D, rb, cb)`` — block row ``r``
   holds the block at block-column ``r·slope + offsets[d]``; missing blocks
   are zero.  ``D`` is static and small.
3. The matvec is then ``einsum('rdij,rdj->ri', blocks, windows(x))`` where
   ``windows`` is a stack of D *static* slices of the zero-padded, reshaped
   ``x`` — pure dense MXU/VPU work with contiguous HBM reads, no gather
   anywhere in the compiled graph.

Rectangular operators (multigrid prolongation/restriction) use the same
representation with ``cb = rb·Nc/Nr`` so the block slope stays 1; coarse-level
orderings are *derived from the fine RCM order* (sort coarse dofs by the mean
fine-row index of their interpolation stencil), which keeps every level's K
and every P/R banded simultaneously (measured: P needs 9 block diagonals,
coarse K bandwidth 139 vs 133 under its own RCM).

The packing (``BandedOp.spec``) is static Python data closed over at trace
time; only the dense ``blocks`` array flows through jit as an argument.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BandedSpec", "pack_banded", "banded_matvec", "banded_matvec_rows",
           "rcm_permutation", "aligned_coarse_permutation"]


class BandedSpec(NamedTuple):
    """Static description of a block-banded packing (hashable; safe to close
    over inside jitted sweeps)."""

    nrows: int
    ncols: int
    rb: int          # row-block size
    cb: int          # col-block size
    offsets: tuple   # block-diagonal offsets d: block (r, r + d)
    R: int           # number of row blocks
    C: int           # number of col blocks


def rcm_permutation(mat) -> np.ndarray:
    """Reverse Cuthill-McKee ordering (perm[i] = old index at new position)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(sp.csr_matrix(mat),
                                            symmetric_mode=True))


def aligned_coarse_permutation(P_finerows_permuted) -> np.ndarray:
    """Order coarse dofs by the mean (already-permuted) fine-row index of
    their prolongation column — keeps P banded AND gives the coarse level a
    bandwidth-minimizing order consistent with the fine one."""
    coo = P_finerows_permuted.tocoo()
    Nc = P_finerows_permuted.shape[1]
    sums = np.zeros(Nc)
    cnts = np.zeros(Nc)
    np.add.at(sums, coo.col, coo.row)
    np.add.at(cnts, coo.col, 1)
    return np.argsort(sums / np.maximum(cnts, 1), kind="stable")


def pack_banded(mat, rb: int = 128, cb: int | None = None, dtype=np.float32):
    """Pack a (reordered) scipy sparse matrix into block-banded form.

    Returns ``(spec, blocks)`` with ``blocks`` a numpy ``(R, D, rb, cb)``
    array.  ``cb`` defaults to ``rb`` scaled by the aspect ratio, rounded to
    a multiple of 8 (sublane width), so the block slope is ~1 and the offset
    set stays small.
    """
    import scipy.sparse as sp

    coo = sp.coo_matrix(mat)
    coo.sum_duplicates()
    Nr, Nc = coo.shape
    if cb is None:
        cb = rb if Nc == Nr else max(8, int(round(rb * Nc / Nr / 8)) * 8)
    R = -(-Nr // rb)
    C = -(-Nc // cb)
    br = coo.row // rb
    bc = coo.col // cb
    offs = np.unique(bc - br)
    off_index = {int(d): k for k, d in enumerate(offs)}
    blocks = np.zeros((R, len(offs), rb, cb), dtype=dtype)
    k = np.fromiter((off_index[int(d)] for d in bc - br), dtype=np.int64,
                    count=len(bc))
    blocks[br, k, coo.row % rb, coo.col % cb] += coo.data
    spec = BandedSpec(Nr, Nc, rb, cb, tuple(int(d) for d in offs), R, C)
    return spec, blocks


def banded_matvec(spec: BandedSpec, blocks, x):
    """``y = A @ x`` for block-banded ``A``: D static slices + one batched
    dense contraction.  ``spec`` must be the static Python object (closed
    over at trace time); ``blocks`` may be a traced array."""
    lo = -min(spec.offsets)
    hi = max(spec.offsets)
    # Pad x to whole column blocks, plus `lo` blocks in front and enough
    # after so every window slice is in range.
    xpad = jnp.zeros(((spec.R + lo + hi) * spec.cb,), dtype=x.dtype)
    xpad = xpad.at[lo * spec.cb : lo * spec.cb + spec.ncols].set(x)
    xb = xpad.reshape(spec.R + lo + hi, spec.cb)
    win = jnp.stack(
        [xb[lo + d : lo + d + spec.R] for d in spec.offsets], axis=1
    )  # (R, D, cb)
    # Precision pinned: these operators ARE the PDE physics — the TPU
    # default single-bf16 MXU pass costs ~1e-2 relative here (caught by
    # the round-5 on-chip unit tests); every production caller already
    # runs under default_matmul_precision("highest"), for which the pin
    # is a no-op.
    y = jnp.einsum("rdij,rdj->ri", blocks, win,
                   precision=jax.lax.Precision.HIGHEST)
    return y.reshape(spec.R * spec.rb)[: spec.nrows]


def banded_matvec_rows(spec: BandedSpec, blocks, xs):
    """K-RHS form ``Y = xs @ Aᵀ`` for block-banded ``A``: ``xs (K, N) →
    (K, nrows)``.

    This is the HBM-amortizing primitive of the large-mesh PDE path: the
    dense ``blocks`` array (the dominant memory traffic — ~30 MB per sweep
    step at 8321 P2 dofs) is streamed from HBM ONCE for all K right-hand
    sides, so K trial/start sweeps cost roughly one (speculative trial
    waves and multistart over the banded engine ride this).

    Layout note: ``blocks`` is consumed in its NATIVE ``(R, D, rb, cb)``
    layout via a multi-dim-contraction dot (``rdij,krdj->kri``) — an
    earlier form that reshaped blocks to ``(R, rb, D·cb)`` inside the
    einsum made XLA re-materialize the 30 MB operator transpose on EVERY
    application (measured 578 vs ~290 ms per 8321-dof sweep at any K).
    Bit-reproducibility across call sites comes from FIXED batch widths,
    not from the contraction layout: callers pad K to a multiple of 8
    (``objectives/pde.py``), so every evaluation lowers identically.
    """
    K = xs.shape[0]
    lo = -min(spec.offsets)
    hi = max(spec.offsets)
    xpad = jnp.zeros((K, (spec.R + lo + hi) * spec.cb), dtype=xs.dtype)
    xpad = xpad.at[:, lo * spec.cb : lo * spec.cb + spec.ncols].set(xs)
    xb = xpad.reshape(K, spec.R + lo + hi, spec.cb)
    win = jnp.stack(
        [xb[:, lo + d : lo + d + spec.R] for d in spec.offsets], axis=2
    )  # (K, R, D, cb)
    y = jnp.einsum("rdij,krdj->kri", blocks, win,
                   precision=jax.lax.Precision.HIGHEST)  # see banded_matvec
    return y.reshape(K, spec.R * spec.rb)[:, : spec.nrows]
