"""Heat-distribution problem: PDE-constrained vector integer control.

Re-design of ``/root/reference/julia_opt/example_heat.jl`` (Section 6.2 of
arXiv:2411.06856):

    ∂_t y − αΔy = f₁(x)u₁(t) + f₂(x)u₂(t)   on Ω×[0,10],  Ω = [−1,1]²
    ∂y/∂n + κ y = κ·T_out                    on Γ
    y(0) = temp0

with two Gaussian heat sources, target temperature ``tempT``, tracking cost
``½(y−y_d)ᵀM(y−y_d)`` plus linear heating cost ``γ Σ u``, and the product
control set ``{0..5}²`` (36 combinations — the DP stress case for L).

The FEM pipeline runs at construction: squareg mesh refined 3×, P2 Lagrange,
stiffness+Robin / mass / load assembly, then dense sweep operators
(``construct_mesh`` and ``assemble_*``, example_heat.jl:104-132, 226-283).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from ..fem import (
    FE_Lagrange,
    area_integrator,
    bdry_integrator,
    mesh_library,
    ndofs,
    quadrature_unit_triangle_area,
    refine_all_cells,
)
from ..objectives.pde import PDEObjective
from ..ops.levels import product_levels

__all__ = ["HeatObj"]


def construct_mesh(hmax=1.0, refinements=3):
    mesh = mesh_library("squareg", hmax)
    for _ in range(refinements):
        mesh = refine_all_cells(mesh)
    return mesh


def construct_mesh_hierarchy(hmax=1.0, refinements=3):
    """Coarse→fine uniform-refinement chain (for the multigrid PDE solver)."""
    meshes = [mesh_library("squareg", hmax)]
    for _ in range(refinements):
        meshes.append(refine_all_cells(meshes[-1]))
    return meshes


class HeatObj(PDEObjective):
    # Device arrays read by the cost hooks — threaded into the jitted sweeps
    # as arguments (see PDEObjective._ops).
    _extra_op_names = ("_Mj", "yd")
    # Cost-hook operators derived from the hashed params (M, tempT) — safe to
    # exclude from the sweep-cache key (see PDEObjective._derived_fields).
    _derived_fields = PDEObjective._derived_fields + ("_Mj", "_Mjv", "_Mjc", "yd")

    def __init__(
        self,
        nt: int = 500,
        *,
        mesh=None,
        fe=None,
        quad_order_a: int = 3,
        quad_order_b: int = 1,
        alpha=1.0,
        c1=(10.0, 10.0),
        c2=(20.0, 20.0),
        kappa=0.12,
        Tout=0.0,
        temp0=10.0,
        tempT=20.0,
        gamma=10.0,
        x1=(-1.0, 0.0),
        x2=(1.0, 0.0),
        solver: str = "dense",
        cg_iters: int = 40,
        mesh_hierarchy=None,
        sparse_format: str = "ell",
        matmul_precision: str = "highest",
        dtype=None,
    ):
        V = [[0, 1, 2, 3, 4, 5], [0, 1, 2, 3, 4, 5]]
        adm = product_levels(V)  # no restriction (example_heat.jl:44)
        super().__init__(T0=0.0, T1=10.0, nt=nt, V=V, admissible=adm, dtype=dtype)

        if solver == "mg" and mesh_hierarchy is None:
            if mesh is not None:
                raise ValueError(
                    "solver='mg' needs the refinement chain: pass "
                    "mesh_hierarchy=[coarse, …, fine] instead of mesh"
                )
            mesh_hierarchy = construct_mesh_hierarchy()
        if mesh_hierarchy is not None:
            mesh = mesh_hierarchy[-1]
        self._mesh_hierarchy = mesh_hierarchy
        self.mesh = mesh if mesh is not None else construct_mesh()
        self.fe = fe if fe is not None else FE_Lagrange(2)
        self.gamma = float(gamma)
        self.kappa, self.Tout = float(kappa), float(Tout)
        self.temp0, self.tempT = float(temp0), float(tempT)

        quad = quadrature_unit_triangle_area(quad_order_a)
        N = ndofs(self.fe, self.mesh)

        # Coefficients (example_heat.jl:70-79).
        h_A = lambda x: alpha * np.eye(2)
        h_alpha = self.kappa
        h_g = self.kappa * self.Tout
        x1 = np.asarray(x1)[:, None]
        x2 = np.asarray(x2)[:, None]
        rhs_fns = [
            lambda x: c2[0] * np.exp(-c1[0] * ((x - x1) ** 2).sum(axis=0)),
            lambda x: c2[1] * np.exp(-c1[1] * ((x - x2) ** 2).sum(axis=0)),
        ]

        # Assembly (assemble_stiffness/mass/rhs/state0, example_heat.jl:228-283).
        A0, _ = area_integrator(self.mesh, self.fe, quad, h_A, None, None, None)
        Q, Gb = bdry_integrator(self.mesh, self.fe, quad_order_b, h_alpha, None)
        A = A0 + Q
        M, _ = area_integrator(self.mesh, self.fe, quad, None, None, 1.0, None)
        _, Gg = bdry_integrator(self.mesh, self.fe, quad_order_b, None, h_g)
        F = np.empty((N, self.nx))
        for i in range(self.nx):
            _, Fi = area_integrator(self.mesh, self.fe, quad, None, None, None, rhs_fns[i])
            F[:, i] = Fi + Gg
        _, Y0 = area_integrator(
            self.mesh, self.fe, quad, None, None, None, lambda x: np.full(x.shape[1], temp0)
        )
        state0 = spla.spsolve(M.tocsc(), Y0)

        # Target temperature distribution (assemble_yd, example_heat.jl:130-132).
        self.yd = jnp.full((N,), self.tempT, dtype=self.dtype)
        if solver in ("cg", "mg"):
            # Matrix-free large-mesh path: the tracking cost applies the mass
            # matrix sparsely (the dense _Mj would be the O(N²) bottleneck).
            # The banded engine's permuted M (PDEObjective._Mblk) is reused
            # directly — yd is spatially uniform, so the permuted tracking
            # cost is identical.
            if sparse_format == "banded":
                self._extra_op_names = ("yd",)
            else:
                from ..fem.sparse_device import to_ell

                Mjv, Mjc = to_ell(M, dtype=self.dtype)
                self._Mjv, self._Mjc = jnp.asarray(Mjv), jnp.asarray(Mjc)
                self._extra_op_names = ("_Mjv", "_Mjc", "yd")
        else:
            self._Mj = jnp.asarray(M.toarray(), dtype=self.dtype)

        self.setup_operators(
            M, A, F, state0, mode=solver, cg_iters=cg_iters,
            mg_meshes=self._mesh_hierarchy, mg_fe=self.fe, fmt=sparse_format,
            matmul_precision=matmul_precision,
        )

    @property
    def _batched_sweeps_bitexact(self):
        # Dense mode evaluates the forward sweep through an explicit K ≥ 2
        # batch (PDEObjective.forward_batch — per-row MXU bits are invariant
        # across batch sizes on TPU) and the scalar decision reductions
        # through row-shaped reduces, so the speculative trial wave's
        # evaluations bit-match the sequential device loop — the wave
        # defaults ON.  Since round 5 the BANDED cg/mg engine does the same
        # through the fixed-width K-RHS sweep (banded_matvec_rows +
        # cg_solve_rows + _G_rows, every batch padded to a multiple of 8):
        # on chip, every PIECE bit-matches across call sites (chases,
        # sweeps, decision reductions — benchmarks/heat_banded_tpu.py and
        # the round-5 differ scripts), and the wave solve follows the
        # sequential trajectory control-for-control; at 8321 dofs the two
        # COMPILED programs' fused CG lowerings still differ in the last
        # J ulp, so after ~dozens of outer iterations a near-boundary
        # accept decision can fork them into different equally-certified
        # optima (measured: wave 0.92 s/outer, J=780.342 vs sequential
        # 3.78 s/outer, J=780.535 — the wave converged 4.1× faster to the
        # LOWER objective).  Exact on CPU f64 (tests).  The ELL engine
        # keeps native matvecs and stays opt-in.
        mode = getattr(self, "solver_mode", "dense")
        return mode == "dense" or (
            mode in ("cg", "mg")
            and getattr(self, "sparse_format", "ell") == "banded"
        )

    def _mass_apply(self, v):
        if getattr(self, "solver_mode", "dense") == "dense":
            return self._Mj @ v
        if self.sparse_format == "banded":
            from ..fem.banded_device import banded_matvec

            return banded_matvec(self._Mspec, self._Mblk, v)
        from ..fem.sparse_device import ell_matvec

        return ell_matvec(self._Mjv, self._Mjc, v)

    # Costs (example_heat.jl:135-161).  Called only under a ≥ 501-point
    # time-vmap (forward) or per-step in the unbatched adjoint, so the MXU
    # forms stay batch-shape-consistent between solver modes.
    def G(self, y, u, i):
        v = y - self.yd
        return 0.5 * v @ self._mass_apply(v)

    def _G_rows(self, ys, uu, t_idx):
        # Row-shaped running cost for the K-RHS banded sweep
        # (PDEObjective._G_rows contract): mass applied to all rows through
        # one streaming of the M blocks, row-axis reductions only.
        mode = getattr(self, "solver_mode", "dense")
        v = ys - self.yd[None, :]
        if mode == "dense":
            mv = v @ self._Mj.T
        elif self.sparse_format == "banded":
            from ..fem.banded_device import banded_matvec_rows

            mv = banded_matvec_rows(self._Mspec, self._Mblk, v)
        else:
            return super()._G_rows(ys, uu, t_idx)
        return (0.5 * jnp.sum(v * mv, axis=-1)
                + self.gamma * jnp.sum(uu, axis=-1))

    def G_t(self, u, i):
        return self.gamma * jnp.sum(u)

    def Gy(self, y, u, i):
        return self._mass_apply(y - self.yd)

    def Gu(self, u, i):
        return self.gamma * jnp.ones(self.nx, self.dtype)
