"""Parabolic PDE-constrained objectives: implicit Euler + discrete adjoint.

Re-design of ``/root/reference/julia_opt/PDEObjective.jl``.  The problem is

    min  ∫∫_Ω G(u, y) dA dt + ∫ G_t(u) dt
    s.t. ∂y/∂t + 𝒜 y = Σ_i f_i(x) u_i(t),   y(T0) = state0,  Robin boundary

semidiscretized by FEM into ``M ẏ + A y = F u`` and stepped by implicit
Euler.  The reference precomputes a sparse LU of ``S = I + τ M⁻¹A`` and
back-substitutes per step (``PDEObjective.jl:129-139``); the TPU-native form
precomputes the DENSE inverse ``S⁻¹`` once at model build (the reference
already densifies ``M⁻¹A``, ``example_heat.jl:254-262``; dofs are O(10³)) so
both sweeps become ``lax.scan``s of dense (N, N)·(N,) matmuls — MXU work:

  state  (``impleuler_state!``):   y_k = S⁻¹ (y_{k−1} + τ (M⁻¹F) u_{k−1})
  adjoint:                          λ_j = S⁻ᵀ (λ_{j+1} + τ w_{j+1} G_y(y_{j+1})),
                                    λ_nt = 0,  w = trapezoid weights
  gradient:                         df_j = (M⁻¹F)ᵀ λ_j + c_j G_u(u_j),
                                    c_0 = ½, else 1

Divergences from the reference (documented; SURVEY.md §3.4 "quirks"):
  1. The reference's adjoint uses ``G_y(y_j)`` where the EXACT gradient of its
     own discretization needs ``w_{j+1}·G_y(y_{j+1})`` (``PDEObjective.jl:167-169``
     evaluates ``Gy!(…, i)`` on ``state[:, i] = y_{i−1}`` and drops the
     trapezoid weight) — an O(τ) gradient error.  We implement the exact
     discrete adjoint, which makes FD-vs-adjoint checks converge.
  2. The reference skips the ``G_u`` term on the first gradient column
     (``PDEObjective.jl:192-197``); the exact coefficient is ½ there.  Set
     ``compat_skip_first_gu=True`` to reproduce the reference.

Objective quadrature (``eval_f_helper``, :142-156)::

    f = τ·( ½ g_0 + Σ_{k=1}^{nt-1} g_k + ½ g_nt ),
    g_k = G(y_k, u_{min(k, nt-1)}) + G_t(u_{min(k, nt-1)})
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .base import LazyObjective

__all__ = ["PDEObjective"]


class PDEObjective(LazyObjective):
    """Abstract parabolic PDE objective.

    Subclasses must, before calling ``super().__init__``-style ``setup``,
    assemble (host-side, numpy/scipy):
      ``M`` (mass), ``A`` (stiffness + Robin), ``F`` (N, nx) load columns,
      ``state0`` (N,) — then call :meth:`setup_operators`.

    And implement:
      ``G(self, y, u, i)``   — area running cost (scalar),
      ``G_t(self, u, i)``    — control running cost (scalar),
      ``Gy(self, y, u, i)``  — ∂G/∂y (N,),
      ``Gu(self, u, i)``     — ∂(G+G_t)/∂u (nx,).
    """

    compat_skip_first_gu: bool = False
    # Reproduce the reference's full (inexact) gradient for parity testing:
    # adjoint drives with Gy at the CURRENT state and unit weight
    # (PDEObjective.jl:167-169 evaluates Gy on state[:, i] = y_{i−1} and has
    # no trapezoid end-weight) and Gu is added with unit weight on columns
    # 1 … nt−1 only (:192-197).  Set as an instance attribute, then call
    # ``_build()`` to recompile.  Implies the skip-first-gu behaviour.
    compat_adjoint: bool = False

    # Excluded from the sweep-cache parameter key (objectives/ode.py
    # ``_params_key``): every field here is a pure function of the hashed
    # parameters (M, A, F, state0, τ, mode, fmt, cg_iters — plus
    # ``_banded_sig`` capturing the static packing).  Subclasses storing
    # INDEPENDENT device arrays must not extend this list with them.
    _derived_fields = (
        "M_invF", "Sinv", "M_invA", "_Kv", "_Kc", "_Mv", "_Mc", "_dinv",
        "_Fdev", "_Kblk", "_Mblk", "_Kspec", "_Mspec", "_mg_ops",
        "_mg_static", "dof_perm", "_dof_iperm", "_mesh_hierarchy",
    )

    def __init__(self, *, T0, T1, nt, nu=0, V=None, admissible=None, dtype=None):
        super().__init__()
        self.T0, self.T1, self.nt = float(T0), float(T1), int(nt)
        self.tau = (self.T1 - self.T0) / self.nt
        self.V = V
        self.admissible = admissible
        self.nu = int(nu)
        self.nv = len(V) if V is not None else 0
        self.dtype = dtype or jnp.result_type(float)
        self.x = jnp.zeros((self.nt, self.nx), dtype=self.dtype)
        self.state = None    # (nt+1, N): y_0 … y_nt
        self.adjoint = None  # (nt+1, N): λ_0-based, λ[nt] = 0

    # -- operator precompute ---------------------------------------------------
    def setup_operators(self, M, A, F, state0, *, mode: str = "dense",
                        cg_iters: int = 40, mg_meshes=None, mg_fe=None,
                        fmt: str = "ell", matmul_precision: str = "highest"):
        """Precompute the sweep operators and compile the scans.

        ``mode="dense"`` (default): dense inverse ``S⁻¹ = (I + τM⁻¹A)⁻¹``
        once at model build (example_heat.jl:111-115 and calculate_M_inv*,
        :242-262) — both sweeps become scans of (N, N)·(N,) MXU matmuls.
        Ideal for the reference's O(10³)-dof meshes; O(N²) memory.

        ``mode="cg"``: matrix-free.  ``K = M + τA`` and ``M`` are stored in
        ELL sparse form on device and each implicit-Euler step solves
        ``K y = M y_prev + τ F u`` with ``cg_iters`` Jacobi-preconditioned CG
        iterations warm-started from the previous step (identical
        discretization: ``S⁻¹v ≡ K⁻¹Mv``, ``S⁻ᵀv ≡ M K⁻¹v``).  O(nnz) memory
        — the large-mesh scale-out path with no reference counterpart.

        ``mode="mg"``: as ``"cg"`` but preconditioned by a geometric
        multigrid V-cycle over ``mg_meshes`` (the coarse→fine refinement
        hierarchy, finest = the assembly mesh) with FE ``mg_fe`` — CG
        iteration counts become h-independent (see :mod:`..fem.multigrid`),
        so ``cg_iters`` can stay small (~8-16) on arbitrarily fine meshes.

        ``fmt`` selects the sparse engine for the cg/mg modes: ``"ell"``
        (gather-based; fine on CPU) or ``"banded"`` (RCM-reordered block-
        banded dense blocks — the TPU path, no gathers; see
        :mod:`..fem.banded_device`).  With ``"banded"`` the whole sweep runs
        in the permuted dof order: cost hooks receive permuted states,
        ``self.state``/``self.adjoint`` are permuted, and
        :meth:`unpermute_dofs` maps back (``self.dof_perm`` holds the
        permutation).

        ``matmul_precision`` sets the MXU pass count for every compiled
        sweep (traced under ``jax.default_matmul_precision``).  The sweeps
        are the framework's physics fidelity (the reference is f64), so
        the default is ``"highest"`` (6 bf16 passes = full f32 — the TPU
        single-pass default cost ~1e-3 relative on the heat objective,
        TPU_TESTS_r02.md); ``"float32"`` (3 passes) is the measured-safe
        speed option on the conv objective and available here as opt-in.
        Part of the sweep-cache key (a plain string attribute).
        """
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        self.matmul_precision = str(matmul_precision)
        if mode not in ("dense", "cg", "mg"):
            raise ValueError(f"unknown operator mode {mode!r}")
        if mode == "mg" and (mg_meshes is None or mg_fe is None):
            raise ValueError("mode='mg' needs mg_meshes (coarse→fine) and mg_fe")
        N = F.shape[0]
        self.Nglobal_dofs = N
        self.solver_mode = mode
        self.cg_iters = int(cg_iters)
        Mc = sp.csc_matrix(M)
        solve_M = spla.factorized(Mc)
        M_invF = np.column_stack(
            [solve_M(np.asarray(F[:, j]).ravel()) for j in range(F.shape[1])]
        )

        self.M = Mc
        self.A = A
        self.F = np.asarray(F)
        self.state0 = np.asarray(state0, dtype=self.dtype)
        # Device-resident sweep operators: passed to the jitted sweeps as
        # explicit ARGUMENTS, never captured in closures (captured device
        # consts permanently degrade dispatch on the axon runtime).
        self.M_invF = jnp.asarray(M_invF, dtype=self.dtype)
        if mode == "dense":
            A_d = A.toarray() if sp.issparse(A) else np.asarray(A)
            M_invA = np.column_stack([solve_M(A_d[:, j]) for j in range(N)])
            S = np.eye(N) + self.tau * M_invA
            self.M_invA = np.asarray(M_invA, dtype=self.dtype)
            self.Sinv = jnp.asarray(np.linalg.inv(S), dtype=self.dtype)
        else:
            K = (Mc + self.tau * sp.csc_matrix(A)).tocsr()
            self.sparse_format = fmt
            if fmt == "banded":
                from ..fem.banded_device import pack_banded, rcm_permutation

                perm = rcm_permutation(K)
                self.dof_perm = perm
                self._dof_iperm = np.argsort(perm)
                Kp = sp.csr_matrix(K)[perm][:, perm]
                Mp = sp.csr_matrix(Mc)[perm][:, perm]
                self._Kspec, Kblk = pack_banded(Kp, dtype=self.dtype)
                self._Mspec, Mblk = pack_banded(Mp, dtype=self.dtype)
                self._Kblk, self._Mblk = jnp.asarray(Kblk), jnp.asarray(Mblk)
                self._dinv = jnp.asarray(1.0 / Kp.diagonal(), dtype=self.dtype)
                self._Fdev = jnp.asarray(self.F[perm], dtype=self.dtype)
                self.M_invF = jnp.asarray(M_invF[perm], dtype=self.dtype)
                self.state0 = self.state0[perm]
                if mode == "mg":
                    from ..fem.multigrid import build_mg_banded

                    self._mg_static, self._mg_ops = build_mg_banded(
                        mg_meshes, mg_fe, K, perm, self.dtype
                    )
                # Hashable signature of the static packing the compiled
                # sweeps close over (part of the sweep-cache key; the block
                # arrays themselves are derived from M/A/F and excluded).
                self._banded_sig = repr(
                    (self._Kspec, self._Mspec, getattr(self, "_mg_static", None))
                )
            elif fmt == "ell":
                from ..fem.sparse_device import to_ell

                Kv, Kc = to_ell(K, dtype=self.dtype)
                Mv, Mcols = to_ell(Mc, dtype=self.dtype)
                self._Kv, self._Kc = jnp.asarray(Kv), jnp.asarray(Kc)
                self._Mv, self._Mc = jnp.asarray(Mv), jnp.asarray(Mcols)
                self._dinv = jnp.asarray(1.0 / K.diagonal(), dtype=self.dtype)
                self._Fdev = jnp.asarray(self.F, dtype=self.dtype)
                if mode == "mg":
                    from ..fem.multigrid import build_mg_ops

                    self._mg_ops = build_mg_ops(mg_meshes, mg_fe, K, self.dtype)
            else:
                raise ValueError(f"unknown sparse format {fmt!r}")
        self._build()

    # Single-solve wave chase preference (trm_device wave_chase): heat
    # nt=500 measured 244.1 iters/s with the trial-wave kernel vs 234.3
    # with the K-fold table broadcast (U is large, nt moderate); ODE shapes
    # prefer the broadcast (fishing: 149.1 vs 115.8 — trm_device.py).
    _wave_chase_default = "trials"

    @property
    def _speculative_multistart(self):
        # Multistart default for the trial wave: PDE iterations are
        # sweep-bound, so batching the trial sweeps still wins under the
        # start vmap (heat ×8: 1.06×, bit-matching); ODE multistarts leave
        # this unset — their start axis already amortizes the per-op
        # overhead (×32 fishing measured 0.89× — trm_device.py).
        return bool(getattr(self, "_batched_sweeps_bitexact", False))

    def unpermute_dofs(self, arr):
        """Map a dof-indexed array (last axis) from the banded engine's
        internal RCM order back to the assembly order (no-op otherwise)."""
        if getattr(self, "dof_perm", None) is None:
            return arr
        return np.asarray(arr)[..., self._dof_iperm]

    # -- user cost hooks -------------------------------------------------------
    def G(self, y, u, i):
        raise NotImplementedError

    def G_t(self, u, i):
        raise NotImplementedError

    def Gy(self, y, u, i):
        return jax.grad(lambda yy: self.G(yy, u, i))(y)

    def Gu(self, u, i):
        return jax.grad(lambda uu: self.G_t(uu, i))(u)

    def _G_rows(self, ys, uu, t_idx):
        """Row-batched running cost ``(Krows, N), (Krows, nx), (Krows,) →
        (Krows,)``: default falls back to a vmap of the scalar hooks.
        Objectives on the banded cg/mg engine should override it with an
        explicitly row-shaped form (K rows on every matmul's LHS, row-axis
        reductions) so the batched sweep's per-row bits match the duplicated
        2-row single evaluation on TPU — see ``HeatObj._G_rows``."""
        return jax.vmap(
            lambda y, u_, t_: self.G(y, u_, t_) + self.G_t(u_, t_)
        )(ys, uu, t_idx)

    # -- device-operator plumbing ---------------------------------------------
    # Subclasses append the names of any device arrays their cost hooks read
    # (e.g. a mass matrix); those are threaded into the jitted sweeps as
    # arguments and temporarily bound onto `self` during tracing.
    _extra_op_names: tuple = ()

    @property
    def _ops(self):
        mode = getattr(self, "solver_mode", "dense")
        if mode in ("cg", "mg"):
            if getattr(self, "sparse_format", "ell") == "banded":
                ops = {
                    "_Kblk": self._Kblk, "_Mblk": self._Mblk,
                    "_dinv": self._dinv, "_Fdev": self._Fdev,
                    "M_invF": self.M_invF,
                }
            else:
                ops = {
                    "_Kv": self._Kv, "_Kc": self._Kc, "_Mv": self._Mv,
                    "_Mc": self._Mc, "_dinv": self._dinv, "_Fdev": self._Fdev,
                    "M_invF": self.M_invF,
                }
            if mode == "mg":
                ops["_mg_ops"] = self._mg_ops
        else:
            ops = {"Sinv": self.Sinv, "M_invF": self.M_invF}
        for k in self._extra_op_names:
            ops[k] = getattr(self, k)
        return ops

    @contextmanager
    def _bound(self, ops):
        old = {k: getattr(self, k) for k in ops}
        for k, v in ops.items():
            setattr(self, k, v)
        try:
            yield
        finally:
            for k, v in old.items():
                setattr(self, k, v)

    # -- compiled sweeps -------------------------------------------------------
    def _build(self):
        from .ode import _SWEEP_CACHE, _params_key

        key = ("pde", type(self), _params_key(self))
        cached = _SWEEP_CACHE.get(key)
        if cached is not None:
            (self._forward_ops, self._adjoint_ops,
             self._forward_batch_ops) = cached
            return

        tau, nt = self.tau, self.nt
        mprec = getattr(self, "matmul_precision", "highest")
        mode = getattr(self, "solver_mode", "dense")
        cg_mode = mode in ("cg", "mg")
        banded = cg_mode and getattr(self, "sparse_format", "ell") == "banded"
        if cg_mode:
            from ..fem.sparse_device import cg_solve, cg_solve_rows, ell_matvec

            cg_iters = self.cg_iters
            if banded:
                from ..fem.banded_device import banded_matvec, banded_matvec_rows

                Kspec, Mspec = self._Kspec, self._Mspec
                make_K = lambda ops: (
                    lambda v: banded_matvec(Kspec, ops["_Kblk"], v)
                )
                make_M = lambda ops: (
                    lambda v: banded_matvec(Mspec, ops["_Mblk"], v)
                )
                # K-RHS forms: the operator blocks (the sweeps' dominant HBM
                # traffic) stream once for ALL rows — what amortizes the
                # large-mesh sweep over speculative trials and starts.
                make_K_rows = lambda ops: (
                    lambda v: banded_matvec_rows(Kspec, ops["_Kblk"], v)
                )
                make_M_rows = lambda ops: (
                    lambda v: banded_matvec_rows(Mspec, ops["_Mblk"], v)
                )
                if mode == "mg":
                    from ..fem.multigrid import mg_apply_banded, mg_apply_banded_rows

                    mg_static = self._mg_static
                    make_pc = lambda ops: (
                        lambda r: mg_apply_banded(mg_static, ops["_mg_ops"], r)
                    )
                    make_pc_rows = lambda ops: (
                        lambda r: mg_apply_banded_rows(mg_static,
                                                       ops["_mg_ops"], r)
                    )
                else:
                    make_pc = lambda ops: ops["_dinv"]
                    make_pc_rows = lambda ops: ops["_dinv"]
            else:
                make_K = lambda ops: (
                    lambda v: ell_matvec(ops["_Kv"], ops["_Kc"], v)
                )
                make_M = lambda ops: (
                    lambda v: ell_matvec(ops["_Mv"], ops["_Mc"], v)
                )
                if mode == "mg":
                    from ..fem.multigrid import mg_apply

                    make_pc = lambda ops: (lambda r: mg_apply(ops["_mg_ops"], r))
                else:
                    make_pc = lambda ops: ops["_dinv"]

        # TPU matmuls default to reduced (bf16-pass) precision; the PDE
        # sweeps are the framework's physics fidelity (the reference is f64)
        # — trace them at full-f32 MXU precision.  Measured error without
        # this: ~1e-3 relative on the heat objective (TPU_TESTS_r02.md);
        # the matrices are small, so the cost is negligible.
        # Dense-mode forwards are BATCH-SHAPED even for a single control:
        # on TPU an MXU matmul's per-row f32 bits are invariant across batch
        # sizes K ≥ 2 (zero-padding included) but the K=1 matvec lowering
        # differs (v5e probe, benchmarks/pde_batch_bitexact.py round 4), so
        # evaluating the single sweep as a duplicated 2-row batch makes the
        # speculative trial wave's K-row sweeps bit-match it lane for lane —
        # at MXU speed (the fold-tree matvec alternative measured 8× slower
        # end-to-end).  Scalar decision reductions (trapezoid, TV, pred)
        # use the same pattern: always-row-shaped reduces whose bits are
        # batch-size invariant for K ≥ 2 (ops/tv.py, trm_device._iv_rows).
        # K-RHS banded sweep (cg/mg × banded): every implicit-Euler step
        # solves K independent systems through ONE streaming of the banded
        # operator blocks (banded_matvec_rows) — at 8321 P2 dofs the blocks
        # are ~30 MB/spmv and utterly dominate the sweep, so K trials or
        # starts cost roughly one (VERDICT r4 item 2; the reference's LU
        # design, PDEObjective.jl:129-156, cannot run this size at all).
        # Row-shaped reductions + K-on-LHS matmul layouts throughout, so a
        # duplicated 2-row call reproduces any row's bits on TPU (the same
        # contract as the dense batch below).
        @jax.jit
        def forward_batch_banded(xs, ops):  # xs (K, nt, nx), K ≥ 2
            with self._bound(ops), jax.default_matmul_precision(mprec):
                Kmvr = make_K_rows(ops)
                Mmvr = make_M_rows(ops)
                pcr = make_pc_rows(ops)
                FdevT = ops["_Fdev"].T
                K_in = xs.shape[0]
                # Fixed-width batches: pad K up to a multiple of 8 with zero
                # rows.  The on-chip probe (benchmarks/heat_banded_tpu.py)
                # showed banded-einsum row bits VARY with the batch width
                # (K=2 vs K=4 lowered differently), so equal-width batches
                # are what makes the duplicated-2-row single reproduce any
                # wave row bit-for-bit — and the K-RHS sweep is HBM-bound
                # on the operator blocks, so width 8 costs the same as
                # width 2 (measured: 578 vs 584 ms at 8321 dofs, nt=200).
                # Zero rows are CG fixed points (guarded updates), never
                # selected.
                Kb = -(-max(K_in, 2) // 8) * 8
                if Kb != K_in:
                    xs = jnp.concatenate(
                        [xs, jnp.zeros((Kb - K_in,) + xs.shape[1:],
                                       xs.dtype)])
                N = self.Nglobal_dofs
                y0 = jnp.broadcast_to(jnp.asarray(self.state0)[None], (Kb, N))

                def step(y, u_t):  # y (K, N), u_t (K, nx)
                    rhs = Mmvr(y) + tau * (u_t @ FdevT)
                    ynew = cg_solve_rows(Kmvr, rhs, y, pcr, cg_iters)
                    return ynew, ynew

                xs_tm = xs.transpose(1, 0, 2)                   # (nt, K, nx)
                _, ys = lax.scan(step, y0, xs_tm)
                # ys stays TIME-major (nt+1, K, N): transposing it to
                # K-major forced the scan's per-step stores into a
                # K-major-layout buffer — scattered (N-sized) row writes at
                # ~4× the per-element cost of the contiguous time-major
                # stacking (xplane, round-5 heat ×8 profile: 6.5 µs/step
                # dynamic_update_slice, ~16% of the batch).  Consumers
                # select start/trial COLUMNS (`ys[:, k]`).  Per-row G bits
                # are position-invariant in the row-stacked MXU call, so
                # reordering the G rows time-major changes no row's bits,
                # and the trapezoid reduce sees the same (Kb, nt+1) logical
                # shape as before — fvals bits unchanged (on-chip suite).
                ys_all = jnp.concatenate([y0[None], ys])        # (nt+1, K, N)

                u_idx = jnp.minimum(jnp.arange(nt + 1), nt - 1)
                uu = xs_tm[u_idx]                               # (nt+1, K, nx)
                t_idx = jnp.repeat(jnp.arange(nt + 1), Kb)
                gvals = self._G_rows(
                    ys_all.reshape((nt + 1) * Kb, N),
                    uu.reshape((nt + 1) * Kb, self.nx),
                    t_idx).reshape(nt + 1, Kb).T
                w = jnp.ones(nt + 1, self.dtype).at[0].set(0.5).at[nt].set(0.5)
                return (tau * jnp.sum(w[None] * gvals, axis=-1)[:K_in],
                        ys_all[:, :K_in])

        @jax.jit
        def forward_batch(xs, ops):  # xs (K, nt, nx), K ≥ 2
            with self._bound(ops), jax.default_matmul_precision(mprec):
                M_invF = ops["M_invF"]
                Sinv = ops["Sinv"]
                Kb = xs.shape[0]
                N = self.Nglobal_dofs
                y0 = jnp.broadcast_to(jnp.asarray(self.state0)[None], (Kb, N))

                def step(ys, us_t):  # ys (K, N), us_t (K, nx)
                    ynew = (ys + tau * (us_t @ M_invF.T)) @ Sinv.T
                    return ynew, ynew

                xs_tm = xs.transpose(1, 0, 2)                   # (nt, K, nx)
                _, ys = lax.scan(step, y0, xs_tm)
                # TIME-major stacking — see forward_batch_banded's note.
                ys_all = jnp.concatenate([y0[None], ys])        # (nt+1, K, N)

                u_idx = jnp.minimum(jnp.arange(nt + 1), nt - 1)
                uu = xs_tm[u_idx]                               # (nt+1, K, nx)
                t_idx = jnp.repeat(jnp.arange(nt + 1), Kb)
                gvals = jax.vmap(
                    lambda y, u_, t_: self.G(y, u_, t_) + self.G_t(u_, t_)
                )(ys_all.reshape((nt + 1) * Kb, N),
                  uu.reshape((nt + 1) * Kb, self.nx),
                  t_idx).reshape(nt + 1, Kb).T
                w = jnp.ones(nt + 1, self.dtype).at[0].set(0.5).at[nt].set(0.5)
                # Native row-reduction: this function always runs with
                # Kb ≥ 2, and row-reduction bits are batch-size invariant
                # (the fold-tree detsum measured ~8× slower end-to-end).
                return tau * jnp.sum(w[None] * gvals, axis=-1), ys_all

        @jax.jit
        def forward(x, ops):
            with self._bound(ops), jax.default_matmul_precision(mprec):
                M_invF = ops["M_invF"]
                if banded:
                    # Route through the duplicated 2-row K-RHS batch: same
                    # function as the speculative wave's K-row sweeps, and
                    # at the banded engine's HBM bound a 2-row sweep costs
                    # the same operator traffic as one.
                    fvals, ys_b = forward_batch_banded(jnp.stack([x, x]), ops)
                    return fvals[0], ys_b[:, 0]
                elif cg_mode:
                    Kmv, Mmv, pc = make_K(ops), make_M(ops), make_pc(ops)

                    # y_k = K⁻¹(M y_{k-1} + τ F u_{k-1}) ≡ S⁻¹(y + τ M⁻¹F u),
                    # warm-started at the previous state.
                    def step(y, u):
                        rhs = Mmv(y) + tau * (ops["_Fdev"] @ u)
                        ynew = cg_solve(Kmv, rhs, y, pc, cg_iters)
                        return ynew, ynew
                else:
                    # Route through the 2-row batch (see forward_batch note).
                    fvals, ys_b = forward_batch(jnp.stack([x, x]), ops)
                    return fvals[0], ys_b[:, 0]

                _, ys = lax.scan(step, jnp.asarray(self.state0), x)
                ys_all = jnp.concatenate([self.state0[None], ys])  # (nt+1, N)

                u_idx = jnp.minimum(jnp.arange(nt + 1), nt - 1)
                gvals = jax.vmap(
                    lambda y, ui, ti: self.G(y, x[ui], ti) + self.G_t(x[ui], ti)
                )(ys_all, u_idx, jnp.arange(nt + 1))
                w = jnp.ones(nt + 1, self.dtype).at[0].set(0.5).at[nt].set(0.5)
                return tau * jnp.sum(w * gvals), ys_all

        @jax.jit
        def adjoint(x, ys_all, ops):
            with self._bound(ops), jax.default_matmul_precision(mprec):
                M_invF = ops["M_invF"]
                lamT = jnp.zeros(self.Nglobal_dofs, self.dtype)
                if cg_mode:
                    Kmv, Mmv, pc = make_K(ops), make_M(ops), make_pc(ops)

                    # S⁻ᵀ v = M K⁻¹ v (M, K symmetric); carry the raw K⁻¹
                    # product as the next step's CG warm start.
                    def bstep(carry, xs):
                        lam, t_prev = carry
                        y_next, u_next, w_next, k = xs
                        v = lam + tau * w_next * self.Gy(y_next, u_next, k)
                        t = cg_solve(Kmv, v, t_prev, pc, cg_iters)
                        newlam = Mmv(t)
                        return (newlam, t), newlam

                    bstep_init = (lamT, lamT)
                else:
                    # Single-shape MXU sweep: the adjoint runs UNBATCHED in
                    # both the sequential and the speculative device loops
                    # (one gradient per outer iteration), so mode-consistency
                    # needs no batch-shape alignment here.
                    SinvT = ops["Sinv"].T

                    def bstep(lam, xs):
                        y_next, u_next, w_next, k = xs
                        newlam = SinvT @ (
                            lam + tau * w_next * self.Gy(y_next, u_next, k)
                        )
                        return newlam, newlam

                    bstep_init = lamT

                if self.compat_adjoint:
                    # Reference recursion (PDEObjective.jl:159-172): Gy at the
                    # CURRENT state y_k, unit weight — an O(τ) gradient error
                    # reproduced for parity testing only.
                    k_s = jnp.arange(nt)
                    w_s = jnp.ones(nt, self.dtype)
                    xs = (ys_all[:-1][::-1], x[k_s][::-1], w_s[::-1], k_s[::-1])
                else:
                    # Exact discrete adjoint: sweep j = nt-1 … 0 with the
                    # (j+1)-th state/control and trapezoid weight (module doc).
                    k_next = jnp.arange(1, nt + 1)
                    w_next = jnp.where(k_next == nt, 0.5, 1.0).astype(self.dtype)
                    u_next = x[jnp.minimum(k_next, nt - 1)]
                    xs = (ys_all[1:][::-1], u_next[::-1], w_next[::-1],
                          k_next[::-1])
                _, lams_rev = lax.scan(bstep, bstep_init, xs)
                lam = lams_rev[::-1]  # (nt, N): λ_0-based columns 0 … nt-1

                df = lam @ M_invF  # (nt, nx): (M⁻¹F)ᵀ λ_j rowwise
                gu = jax.vmap(self.Gu)(x, jnp.arange(nt))
                # G_t weight per control column: u_j appears in g_j (weight
                # w_j) and u_{nt-1} additionally in g_nt (weight ½).
                cj = jnp.ones((nt, 1), self.dtype).at[0, 0].set(0.5).at[-1, 0].set(1.5)
                if self.compat_adjoint:
                    # Reference Gu loop (PDEObjective.jl:190-197): unit weight
                    # on columns 1 … nt−1, nothing on column 0.
                    cj = jnp.ones((nt, 1), self.dtype).at[0, 0].set(0.0)
                elif self.compat_skip_first_gu:
                    cj = cj.at[0, 0].set(0.0)  # reference (PDEObjective.jl:192-197)
                return df + cj * gu, lam

        self._forward_ops = forward
        self._adjoint_ops = adjoint
        if banded:
            self._forward_batch_ops = forward_batch_banded
        elif not cg_mode:
            self._forward_batch_ops = forward_batch
        else:
            self._forward_batch_ops = None
        _SWEEP_CACHE[key] = (forward, adjoint, self._forward_batch_ops)

    # Uniform sweep API used by solvers/parallel code.
    def _forward(self, x):
        return self._forward_ops(x, self._ops)

    def _adjoint(self, x, ys_all):
        return self._adjoint_ops(x, ys_all, self._ops)

    def _sweep_ops(self):
        return self._ops

    def _forward_with(self, x, ops):
        return self._forward_ops(x, ops)

    def _forward_batch_with(self, xs, ops):
        """Batched forward sweep ``xs (K, nt, nx) → (fvals (K,),
        ys (nt+1, K, N))`` whose per-row bits equal :meth:`_forward_with`
        on the same control (dense mode and the banded cg/mg engine; the
        speculative trial wave's evaluation path).  ``ys`` is TIME-major
        with the batch axis SECOND — consumers select ``ys[:, k]`` (the
        scan's natural stacking; a K-major return forced scattered
        per-step stores, ~16% of the heat ×8 batch).  ``None`` for the
        ELL cg/mg engine — callers fall back to ``jax.vmap``."""
        if self._forward_batch_ops is None:
            return None
        return self._forward_batch_ops(xs, ops)

    def _adjoint_with(self, x, aux, ops):
        return self._adjoint_ops(x, aux, ops)

    # -- protocol hooks --------------------------------------------------------
    def eval_f_impl(self, x, cache: bool):
        fval, ys_all = self._forward(x)
        return fval, ys_all

    def eval_f_(self):
        f = super().eval_f_()
        self.state = self._aux
        return f

    def eval_df_impl(self):
        df, lam = self._adjoint(self.x, self._aux)
        self.adjoint = lam
        return df
