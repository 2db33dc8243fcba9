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

__all__ = ["build_mg_ops", "mg_apply"]


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
