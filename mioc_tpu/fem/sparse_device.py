"""Device-resident sparse linear algebra for the PDE sweeps.

The reference back-substitutes a precomputed UMFPACK LU per implicit-Euler
step (``/root/reference/julia_opt/PDEObjective.jl:129-139``) — a host-side,
inherently sequential triangular solve.  The dense TPU path in
:mod:`..objectives.pde` replaces it with a precomputed dense inverse (MXU
matmuls), which is ideal up to a few thousand dofs but costs O(N²) memory.

This module provides the **matrix-free** alternative for large meshes:

* ELL (padded-row) sparse storage — ``values (N, K)`` / ``cols (N, K)`` with
  rows padded by zero-weighted self-references.  The matvec is one gather and
  one row reduction: regular, static-shape, HBM-bandwidth-bound work that XLA
  maps well to the VPU (no dynamic sparsity structure in the compiled graph).
* A fixed-iteration Jacobi-preconditioned conjugate-gradient solve, jit- and
  scan-safe (no data-dependent control flow; division guards make exact
  convergence a fixed point rather than a NaN).

Both FEM operators involved (mass ``M`` and ``K = M + τA`` with Robin terms)
are symmetric positive definite, and the implicit-Euler sweeps warm-start CG
from the previous time step, so a few dozen iterations reach near machine
precision in practice (tests compare against the dense-inverse path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["to_ell", "ell_matvec", "cg_solve", "cg_solve_rows"]


def to_ell(mat, dtype=np.float64):
    """Convert a scipy sparse (or dense) matrix to padded ELL arrays.

    Returns ``(values, cols)`` of shape ``(N, K)`` with ``K`` = max row nnz;
    padding entries have ``value 0`` and ``col = row`` (an inert gather).
    """
    import scipy.sparse as sp

    csr = sp.csr_matrix(mat)
    csr.sum_duplicates()
    N = csr.shape[0]
    row_nnz = np.diff(csr.indptr)
    K = max(1, int(row_nnz.max()))
    values = np.zeros((N, K), dtype=dtype)
    cols = np.tile(np.arange(N, dtype=np.int32)[:, None], (1, K))
    for i in range(N):
        lo, hi = csr.indptr[i], csr.indptr[i + 1]
        values[i, : hi - lo] = csr.data[lo:hi]
        cols[i, : hi - lo] = csr.indices[lo:hi]
    return values, cols


def ell_matvec(values, cols, x):
    """``y = A @ x`` for ELL-format ``A``: gather + row-sum."""
    return jnp.sum(values * x[cols], axis=1)


def cg_solve(matvec, b, x0, precond, iters: int):
    """Fixed-iteration preconditioned CG for SPD ``matvec``.

    ``precond`` is either the Jacobi vector ``1/diag(A)`` or a callable
    ``r -> z`` applying any SPD preconditioner (e.g. a multigrid V-cycle,
    :func:`..fem.multigrid.mg_apply`).  Runs exactly ``iters`` iterations
    (static, scan-safe); once the residual hits zero the guarded updates make
    further iterations no-ops, so over-provisioning ``iters`` costs time but
    never accuracy.  Uses ``lax.scan`` (not fori_loop) so the solve is
    reverse-mode differentiable if a user autodiffs through a sweep.
    """
    apply_pc = precond if callable(precond) else (lambda r: precond * r)
    x = x0
    r = b - matvec(x)
    z = apply_pc(r)
    p = z
    rz = jnp.vdot(r, z)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_pc(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = lax.scan(body, (x, r, p, rz), None, length=iters)
    return x


def cg_solve_rows(matvec_rows, b, x0, precond_rows, iters: int):
    """K-row preconditioned CG: ``b/x0 (K, N)``, each row an independent
    SPD solve through a SHARED K-RHS operator application.

    This is :func:`cg_solve` with every reduction row-shaped
    (``jnp.sum(·, axis=-1) → (K,)``) and every scalar broadcast per row —
    no cross-row coupling anywhere, so row k's iterates depend only on row
    k's inputs.  Combined with a K-RHS ``matvec_rows`` whose per-row bits
    are batch-size invariant (``banded_matvec_rows``) and the measured
    invariance of row reductions for K ≥ 2 (v5e probe, round 4), a
    duplicated 2-row call reproduces any batched row bit-for-bit on TPU —
    which is what lets the speculative trial wave reach the cg/mg PDE
    engines (``objectives/pde.py``).

    ``precond_rows`` is the Jacobi vector ``1/diag(A)`` (broadcast over
    rows) or a callable ``R (K, N) -> Z (K, N)`` applying an SPD
    preconditioner per row (e.g. :func:`..fem.multigrid.mg_apply_banded_rows`).
    """
    apply_pc = (precond_rows if callable(precond_rows)
                else (lambda r: precond_rows[None, :] * r))
    x = x0
    r = b - matvec_rows(x)
    z = apply_pc(r)
    p = z
    rz = jnp.sum(r * z, axis=-1)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec_rows(p)
        pAp = jnp.sum(p * Ap, axis=-1)
        alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        x = x + alpha[:, None] * p
        r = r - alpha[:, None] * Ap
        z = apply_pc(r)
        rz_new = jnp.sum(r * z, axis=-1)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + beta[:, None] * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = lax.scan(body, (x, r, p, rz), None, length=iters)
    return x
