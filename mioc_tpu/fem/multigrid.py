"""Geometric multigrid V-cycle preconditioner for the device PDE sweeps.

No reference counterpart (`/root/reference` back-substitutes one UMFPACK LU,
`julia_opt/PDEObjective.jl:129-139`, and is capped at O(10³) dofs): this is
the framework's large-mesh scale-out path.  Plain Jacobi-CG on
``K = M + τA`` needs O(1/h) iterations (cond(K) ~ τ/h²); a V-cycle over the
uniform-refinement mesh hierarchy makes the iteration count h-independent.

Everything is built host-side once at model construction and applied on
device with static shapes:

* level operators by Galerkin coarsening ``K_c = Pᵀ K_f P`` using the nodal
  :func:`..fem.mesh.prolongation` matrix between consecutive meshes;
* all per-level operators (K, P, R = Pᵀ) stored ELL (see
  :mod:`.sparse_device`) — each V-cycle is a fixed tree of gathers, row sums
  and axpys, unrolled at trace time (static recursion over levels);
* damped-Jacobi smoothing, ν sweeps pre and post (symmetric, so the cycle is
  a valid SPD preconditioner for CG);
* the coarsest level solved by a precomputed dense inverse (one small MXU
  matmul).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .sparse_device import ell_matvec, to_ell

__all__ = ["build_mg_ops", "mg_apply", "build_mg_banded", "mg_apply_banded",
           "mg_apply_banded_rows"]


def build_mg_ops(meshes, fe, K_fine, dtype=np.float64):
    """Build the device operator pytree for :func:`mg_apply`.

    ``meshes`` is the hierarchy coarse → fine (each a uniform refinement of
    the previous, as produced by repeated ``refine_all_cells``); ``K_fine``
    the SPD system matrix on the finest mesh.
    """
    import scipy.sparse as sp

    from .mesh import prolongation

    Ks = [sp.csr_matrix(K_fine)]
    Ps = []  # Ps[l]: level-(l+1)-coarse -> level-l-fine prolongation
    for i in range(len(meshes) - 1, 0, -1):
        P = sp.csr_matrix(prolongation(meshes[i - 1], meshes[i], fe))
        Ps.append(P)
        Ks.append(sp.csr_matrix(P.T @ Ks[-1] @ P))

    levels = []
    for K, P in zip(Ks[:-1], Ps):
        Kv, Kc = to_ell(K, dtype)
        Pv, Pc = to_ell(P, dtype)
        Rv, Rc = to_ell(P.T.tocsr(), dtype)
        levels.append(
            {
                "Kv": jnp.asarray(Kv), "Kc": jnp.asarray(Kc),
                "dinv": jnp.asarray(1.0 / K.diagonal(), dtype=dtype),
                "Pv": jnp.asarray(Pv), "Pc": jnp.asarray(Pc),
                "Rv": jnp.asarray(Rv), "Rc": jnp.asarray(Rc),
            }
        )
    coarse_inv = jnp.asarray(np.linalg.inv(Ks[-1].toarray()), dtype=dtype)
    return {"levels": tuple(levels), "coarse_inv": coarse_inv}


def mg_apply(ops, b, *, omega: float = 0.6, nu: int = 2):
    """One V(ν,ν) cycle ``z ≈ K⁻¹ b`` (zero initial guess).  Pure function of
    the pytree ``ops`` — safe to close over inside jitted sweeps as long as
    ``ops`` arrives as an argument."""
    levels = ops["levels"]

    def cycle(l, b):
        if l == len(levels):
            return ops["coarse_inv"] @ b
        L = levels[l]
        Kmv = lambda v: ell_matvec(L["Kv"], L["Kc"], v)
        # Pre-smooth: ν damped-Jacobi sweeps from zero.
        x = omega * L["dinv"] * b
        for _ in range(nu - 1):
            x = x + omega * L["dinv"] * (b - Kmv(x))
        # Coarse-grid correction.
        r = b - Kmv(x)
        rc = ell_matvec(L["Rv"], L["Rc"], r)
        ec = cycle(l + 1, rc)
        x = x + ell_matvec(L["Pv"], L["Pc"], ec)
        # Post-smooth (same ν: keeps the cycle symmetric ⇒ SPD for CG).
        for _ in range(nu):
            x = x + omega * L["dinv"] * (b - Kmv(x))
        return x

    return cycle(0, b)


def build_mg_banded(meshes, fe, K_fine, perm_fine, dtype=np.float32):
    """Block-banded variant of :func:`build_mg_ops` (the TPU path: no gathers,
    see :mod:`.banded_device`).

    ``K_fine`` is the finest-level SPD matrix in the ORIGINAL dof order;
    ``perm_fine`` its RCM permutation (the caller keeps its whole sweep in
    this permuted space).  Coarse-level orderings are derived per level with
    :func:`.banded_device.aligned_coarse_permutation`, which keeps every K
    and every P/R banded at once.

    Returns ``(static, ops)``: ``static`` is hashable per-level packing
    metadata to close over at trace time; ``ops`` the pytree of dense block
    arrays to thread through jit as arguments.
    """
    import scipy.sparse as sp

    from .banded_device import aligned_coarse_permutation, pack_banded
    from .mesh import prolongation

    Kp = sp.csr_matrix(K_fine)[perm_fine][:, perm_fine]
    static, levels = [], []
    for i in range(len(meshes) - 1, 0, -1):
        P = sp.csr_matrix(prolongation(meshes[i - 1], meshes[i], fe))
        if i == len(meshes) - 1:
            P = P[perm_fine]
        else:
            P = P[perm_prev]
        perm_prev = aligned_coarse_permutation(P)
        Pp = sp.csr_matrix(P[:, perm_prev])
        Kspec, Kblk = pack_banded(Kp, dtype=dtype)
        Pspec, Pblk = pack_banded(Pp, dtype=dtype)
        Rspec, Rblk = pack_banded(sp.csr_matrix(Pp.T), dtype=dtype)
        static.append({"Kspec": Kspec, "Pspec": Pspec, "Rspec": Rspec})
        levels.append(
            {
                "Kblk": jnp.asarray(Kblk),
                "dinv": jnp.asarray(1.0 / Kp.diagonal(), dtype=dtype),
                "Pblk": jnp.asarray(Pblk),
                "Rblk": jnp.asarray(Rblk),
            }
        )
        Kp = sp.csr_matrix(Pp.T @ Kp @ Pp)
    ops = {
        "levels": tuple(levels),
        "coarse_inv": jnp.asarray(np.linalg.inv(Kp.toarray()), dtype=dtype),
    }
    return tuple(static), ops


def mg_apply_banded(static, ops, b, *, omega: float = 0.6, nu: int = 2):
    """V(ν,ν) cycle with block-banded operators (TPU path).  ``static`` must
    be the Python metadata from :func:`build_mg_banded` (closed over at trace
    time); ``ops`` the matching array pytree (a jit argument)."""
    from .banded_device import banded_matvec

    levels = ops["levels"]

    def cycle(l, b):
        if l == len(levels):
            return ops["coarse_inv"] @ b
        L, S = levels[l], static[l]
        Kmv = lambda v: banded_matvec(S["Kspec"], L["Kblk"], v)
        x = omega * L["dinv"] * b
        for _ in range(nu - 1):
            x = x + omega * L["dinv"] * (b - Kmv(x))
        r = b - Kmv(x)
        rc = banded_matvec(S["Rspec"], L["Rblk"], r)
        ec = cycle(l + 1, rc)
        x = x + banded_matvec(S["Pspec"], L["Pblk"], ec)
        for _ in range(nu):
            x = x + omega * L["dinv"] * (b - Kmv(x))
        return x

    return cycle(0, b)


def mg_apply_banded_rows(static, ops, b, *, omega: float = 0.6, nu: int = 2):
    """K-row V(ν,ν) cycle: ``b (K, N) → (K, N)``, each row an independent
    cycle through SHARED K-RHS banded operators
    (:func:`..fem.banded_device.banded_matvec_rows` — level operator blocks
    stream from HBM once for all K rows).  Smoothing is elementwise (row-
    independent by construction); the coarse solve is ``b_c @ K_c⁻ᵀ`` with
    the K rows on the matmul's LHS (the batch-invariant-row layout).  Used
    as the CG preconditioner by the batched cg/mg PDE sweeps."""
    from .banded_device import banded_matvec_rows

    levels = ops["levels"]

    def cycle(l, b):
        if l == len(levels):
            return b @ ops["coarse_inv"].T
        L, S = levels[l], static[l]
        Kmv = lambda v: banded_matvec_rows(S["Kspec"], L["Kblk"], v)
        dinv = L["dinv"][None, :]
        x = omega * dinv * b
        for _ in range(nu - 1):
            x = x + omega * dinv * (b - Kmv(x))
        r = b - Kmv(x)
        rc = banded_matvec_rows(S["Rspec"], L["Rblk"], r)
        ec = cycle(l + 1, rc)
        x = x + banded_matvec_rows(S["Pspec"], L["Pblk"], ec)
        for _ in range(nu):
            x = x + omega * dinv * (b - Kmv(x))
        return x

    return cycle(0, b)
