"""ODE-constrained objectives: forward-Euler state sweep + discrete adjoint.

Re-design of ``/root/reference/julia_opt/ODEObjective.jl``.  The problem is

    min  ∫_{T0}^{T1} G(y, u) dt      s.t.  y' = F(y, u),  y(T0) = state0

discretized by explicit Euler on an equidistant grid with trapezoidal
objective quadrature.  Both sweeps are ``lax.scan``s — sequential in time but
fused on-device; the gradient is the reference's *discrete adjoint* recursion
(``ODEObjective.jl:153-184``), reproduced index-for-index so that objective
and gradient match the Julia solver to rounding error:

  forward (``eval_f_helper``, :125-150), 0-based time-major indices::

      y_{k+1} = y_k + τ F(y_k, u_k)                       k = 0 … nt-1
      f = τ·( ½ G(y_0,u_0) + Σ_{k=1}^{nt-1} G(y_k,u_k) + ½ G(y_nt,u_{nt-1}) )

  adjoint (``eval_df_helper``, :153-184)::

      λ_{nt-1} = −½ τ G_y(y_nt, u_{nt-1})                       (:165-166)
      λ_k = λ_{k+1} + τ( F_y(y_{k+1},u_{k+1})ᵀ λ_{k+1} − G_y(y_{k+1},u_{k+1}) )
      df_k = −F_u(y_k, u_k)ᵀ λ_k + G_u(y_k, u_k)                (:177-183)

Users implement ``F(y, u, i)`` and ``G(y, u, i)`` only; the Jacobians
``Fy/Fu/Gy/Gu`` default to ``jax.jacfwd``/``jax.grad`` of those (the reference
requires hand-written Jacobians, ``ODEObjective.jl:243-248``; hand-written
overrides remain supported for parity testing and speed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .base import LazyObjective

__all__ = ["ODEObjective", "const_dot"]


def const_dot(u, v):
    """Dot of a traced vector ``u`` with a small CONSTANT vector ``v``,
    unrolled into Python-float scalar immediates.

    Use this (instead of ``u @ v``) for model-constant couplings inside the
    per-step ``F``/``Fy`` dynamics: a constant f32[L] buffer in a scan body
    is VMEM-pinned by XLA in scan-only modules but demoted to HBM when the
    same jitted module also contains Pallas custom calls (the fused device
    TRM), costing ~0.34 ms per nt=1024 sweep — scalar immediates fold into
    the fused elementwise ops and leave nothing to place (measured 1.60× on
    ×32 fishing multistart, ``benchmarks/multistart_pinning.py``).
    """
    v = np.asarray(v)
    return sum(float(c) * u[m] for m, c in enumerate(v.ravel()))

# Compiled sweeps are cached per (class, parameter signature): constructing a
# second instance with the same configuration reuses the jitted forward and
# adjoint instead of re-tracing/re-compiling (compiles cost minutes through
# the axon remote-compile tunnel).
_SWEEP_CACHE: dict = {}

_NONPARAM_FIELDS = {
    "x", "state", "adjoint", "df", "f", "df_valid", "f_evals", "df_evals",
    "fdf_evals", "V", "admissible", "_aux", "_forward", "_adjoint",
    "_forward_ops", "_adjoint_ops", "_forward_batch_ops", "mesh", "fe",
}


def _is_scipy_sparse(v) -> bool:
    try:
        import scipy.sparse as sp

        return sp.issparse(v)
    except ImportError:  # pragma: no cover
        return False


def _params_key(obj) -> tuple:
    """Hashable signature of an objective's parameters.  Unhandled attribute
    types (e.g. device arrays a subclass stored directly) make the key unique
    per instance — caching is DISABLED rather than risking a collision that
    would silently reuse another instance's compiled dynamics.

    Fields listed in the class attribute ``_derived_fields`` are EXCLUDED:
    they must be pure functions of the hashed parameters (e.g. the PDE sweep
    operators derived from M/A/F/τ), so two instances agreeing on the key
    are guaranteed to agree on them too.  Subclasses that store independent
    device arrays must NOT list them there (they then disable caching, which
    is the safe default)."""
    derived = getattr(obj, "_derived_fields", ())
    items = []
    for k, v in sorted(obj.__dict__.items()):
        if k in _NONPARAM_FIELDS or k in derived:
            continue
        if _is_scipy_sparse(v):
            c = v.tocsr()
            items.append(
                (k, "sp", c.shape, c.indptr.tobytes(), c.indices.tobytes(),
                 c.data.tobytes())
            )
        elif isinstance(v, (bool, int, float, str)):
            items.append((k, v))
        elif isinstance(v, np.ndarray):
            items.append((k, v.dtype.str, v.shape, v.tobytes()))
        elif isinstance(v, (list, tuple)):
            if all(isinstance(e, str) for e in v):
                items.append((k, "strs", tuple(v)))
                continue
            try:
                a = np.asarray(v, dtype=np.float64)
                items.append((k, a.shape, a.tobytes()))
            except (ValueError, TypeError):
                items.append((k, "<uncacheable>", id(obj)))
        elif isinstance(v, np.dtype) or v is None:
            items.append((k, str(v)))
        elif hasattr(v, "dtype") and hasattr(v, "shape"):
            # A device array stored as a parameter: no safe cheap hash
            # (reading it back is costly on the axon runtime) — unique key.
            items.append((k, "<uncacheable-device-array>", id(obj)))
    return tuple(items)


class ODEObjective(LazyObjective):
    """Abstract ODE objective.  Subclasses set dimensions and implement
    ``F(self, y, u, i)`` (rhs, shape ``(ny,)``) and ``G(self, y, u, i)``
    (running cost, scalar); optionally ``Fy``, ``Fu``, ``Gy``, ``Gu``.

    Note on ``_batched_sweeps_bitexact`` (class attribute, default True):
    it declares that ``jax.vmap`` of the sweeps reproduces each lane's
    single-sweep arithmetic bit-for-bit, which enables speculative trial
    waves by default in the device TRM.  That holds for elementwise per-step
    dynamics (all bundled models); a subclass whose ``F``/``G`` contracts a
    matrix against the state (``y @ A`` on a larger state) gets those dots
    batched into matmuls under vmap, changing f32 accumulation order — such
    subclasses should set ``_batched_sweeps_bitexact = False`` (the
    PDE/convolution objectives do).
    """

    # The scan sweeps are elementwise per time step: ``jax.vmap`` over a
    # candidate/start axis computes each lane with the identical arithmetic,
    # so batched sweeps bit-match single sweeps even in f32.  Enables
    # speculative halving by default in the device TRM (trm_device.py) —
    # matmul-bearing objectives (PDE, convolution) must leave this False.
    _batched_sweeps_bitexact = True

    def __init__(self, *, T0, T1, nt, state0, nu=0, V=None, admissible=None,
                 dtype=None, sweep_unroll=8):
        super().__init__()
        self.T0 = float(T0)
        self.T1 = float(T1)
        self.nt = int(nt)
        # lax.scan unroll factor for both sweeps.  The per-step state is tiny
        # (f32[ny]), so the sweeps are bound by while-loop bookkeeping, not
        # compute: an op-level profile of the single-start device TRM
        # (benchmarks/singletrm_trace.py) showed ~3 µs/step of loop overhead
        # vs ~1.5 µs of fused op time at nt=1024.  Unrolling amortizes the
        # bookkeeping; it is bit-identical (same per-step ops, same order).
        self.sweep_unroll = int(sweep_unroll)
        self.tau = (self.T1 - self.T0) / self.nt
        self.V = V
        self.admissible = admissible
        self.nu = int(nu)
        self.nv = len(V) if V is not None else 0
        self.dtype = dtype or jnp.result_type(float)
        # NOTE: constants captured by the jitted sweeps are kept as NUMPY
        # arrays (baked into the program as literals).  Capturing device
        # arrays in a jit closure permanently degrades dispatch latency on
        # the axon TPU runtime (see BASELINE_SELF.md).
        self.state0 = np.asarray(state0, dtype=self.dtype)
        self.ny = self.state0.shape[0]
        self.x = jnp.zeros((self.nt, self.nx), dtype=self.dtype)
        self.state = None    # (nt, ny): y_1 … y_nt  (reference obj.state)
        self.adjoint = None  # (nt, ny): λ_1 … λ_nt  (reference obj.adjoint)
        self._build()

    # -- user dynamics ---------------------------------------------------------
    def F(self, y, u, i):
        raise NotImplementedError

    def G(self, y, u, i):
        raise NotImplementedError

    # Default Jacobians via autodiff; override for hand-written versions.
    def Fy(self, y, u, i):
        return jax.jacfwd(lambda yy: self.F(yy, u, i))(y)

    def FyT_lam(self, y, u, lam, i):
        """Adjoint-mode product ``Fyᵀλ`` — the only dynamics derivative the
        backward scan consumes.  Default: ``jax.vjp`` of ``F``, an
        elementwise chain that FUSES into the scan body.  Materializing the
        ``Fy`` matrix per step and transpose-matvec'ing it (the previous
        form — whether from :meth:`Fy`'s autodiff default or a hand-written
        ``jnp.array`` of scalars) fragments the tiny-state adjoint into
        dozens of (1,2)-shaped fusions: the fishing adjoint sweep measured
        5.05 ms vs the forward's 46 µs at nt=1024 on v5e (round-4 xplane
        profile) — 72% of the device solve.  Override together with
        :meth:`Fy` for hand-written parity versions."""
        _, vjp = jax.vjp(lambda yy: self.F(yy, u, i), y)
        return vjp(lam)[0]

    def Fu(self, y, u, i):
        return jax.jacfwd(lambda uu: self.F(y, uu, i))(u)

    def Gy(self, y, u, i):
        return jax.grad(lambda yy: self.G(yy, u, i))(y)

    def Gu(self, y, u, i):
        return jax.grad(lambda uu: self.G(y, uu, i))(u)

    # -- user-facing FD Jacobian checkers --------------------------------------
    # Re-design of ``test_Fy!``/``test_Fu!`` (ODEObjective.jl:186-241): a user
    # bringing hand-written Jacobians to a new model verifies them against
    # forward differences of F at a random admissible point over a sweep of
    # step sizes.  Returns the per-step relative errors; the minimum should
    # display the classic FD V-shape (≈ sqrt(eps) at the optimal step).

    def sample_point(self, rng):
        """Random ``(y, u, i)`` for the FD checks.  Override for dynamics with
        restricted domains (the reference's domain-aware variants,
        ``example_doubletank.jl:116-179``)."""
        y = jnp.asarray(rng.standard_normal(self.ny), self.dtype)
        if self.admissible is not None and self.admissible.L:
            u = jnp.asarray(
                self.admissible.levels[rng.integers(self.admissible.L)],
                self.dtype,
            )
        else:
            u = jnp.asarray(rng.standard_normal(self.nx), self.dtype)
        return y, u, int(rng.integers(self.nt))

    def _test_jac(self, wrt, seed, steps, verbose):
        rng = np.random.default_rng(seed)
        y, u, i = self.sample_point(rng)
        if steps is None:
            steps = np.logspace(-10, 0, 11)
        if wrt == "y":
            h = rng.standard_normal(self.ny)
        else:
            h = rng.standard_normal(self.nx)
        h = jnp.asarray(h / np.linalg.norm(h), self.dtype)
        if wrt == "y":
            J = np.asarray(self.Fy(y, u, i))
            fd_of = lambda t: (self.F(y + t * h, u, i) - self.F(y, u, i)) / t
        else:
            J = np.asarray(self.Fu(y, u, i))
            fd_of = lambda t: (self.F(y, u + t * h, i) - self.F(y, u, i)) / t
        Jh = J @ np.asarray(h)
        scale = max(float(np.linalg.norm(Jh)), 1.0)
        errs = np.array(
            [float(np.linalg.norm(np.asarray(fd_of(t)) - Jh)) / scale
             for t in steps]
        )
        if verbose:
            name = "Fy" if wrt == "y" else "Fu"
            for t, e in zip(steps, errs):
                print(f"{name}: t = {t:9.3e}   rel err = {e:9.3e}")
        return errs

    def test_Fy(self, seed=None, steps=None, verbose=False):
        """FD-check the state Jacobian ``Fy`` (ODEObjective.jl:186-213)."""
        return self._test_jac("y", seed, steps, verbose)

    def test_Fu(self, seed=None, steps=None, verbose=False):
        """FD-check the control Jacobian ``Fu`` (ODEObjective.jl:215-241)."""
        return self._test_jac("u", seed, steps, verbose)

    # -- compiled sweeps -------------------------------------------------------
    def _build(self):
        key = (type(self), _params_key(self))
        cached = _SWEEP_CACHE.get(key)
        if cached is not None:
            self._forward, self._adjoint, self._forward_batch_ops = cached
            return

        tau, nt = self.tau, self.nt
        unroll = max(1, min(self.sweep_unroll, nt))

        def forward(x):
            def step(y, xs):
                u, i = xs
                ynew = y + tau * self.F(y, u, i)
                return ynew, ynew

            idx = jnp.arange(nt)
            _, ys = lax.scan(step, self.state0, (x, idx),
                             unroll=unroll)  # ys[k] = y_{k+1}

            ys_all = jnp.concatenate([self.state0[None], ys])  # y_0 … y_nt
            # G-argument indices per the reference (time idx i, control col):
            #   k=0: G(0, y_0, u_0); 1≤k≤nt-1: G(k, y_k, u_k);
            #   k=nt: G(nt-1, y_nt, u_{nt-1}).
            u_idx = jnp.minimum(jnp.arange(nt + 1), nt - 1)
            g_t_idx = jnp.concatenate([jnp.arange(nt), jnp.array([nt - 1])])
            gvals = jax.vmap(lambda y, ui, ti: self.G(y, x[ui], ti))(
                ys_all, u_idx, g_t_idx
            )
            w = jnp.ones(nt + 1, self.dtype).at[0].set(0.5).at[nt].set(0.5)
            fval = tau * jnp.sum(w * gvals)
            return fval, ys

        def adjoint(x, ys):
            # Terminal condition (ODEObjective.jl:165-166).
            lamT = -0.5 * tau * self.Gy(ys[-1], x[-1], nt)

            def bstep(lam, xs):
                y, u, i = xs
                newlam = lam + tau * (self.FyT_lam(y, u, lam, i)
                                      - self.Gy(y, u, i))
                return newlam, newlam

            # k = nt-2 … 0 uses (y_{k+1}, u_{k+1}) = (ys[k], x[k+1]).
            xs = (ys[:-1][::-1], x[1:][::-1], jnp.arange(1, nt)[::-1])
            _, lams_rev = lax.scan(bstep, lamT, xs, unroll=unroll)
            lam = jnp.concatenate([lams_rev[::-1], lamT[None]])  # λ_0-based k

            ys0 = jnp.concatenate([self.state0[None], ys[:-1]])  # y_0 … y_{nt-1}

            def dfk(y, u, l, i):
                return -self.Fu(y, u, i).T @ l + self.Gu(y, u, i)

            df = jax.vmap(dfk)(ys0, x, lam, jnp.arange(nt))
            return df, lam

        # Always-batched evaluation (round 4): on TPU a SINGLE tiny-state
        # sweep lowers its scalar-indexed step math into dozens of separate
        # (1,)-shaped scalar-pipeline ops with per-op overhead — the fishing
        # adjoint scan measured 6.6 ms vs 46 µs for the SAME math as a
        # batched sweep (xplane profile, benchmarks/singletrm_trace.py).
        # So singles run as duplicated 2-row batches of the vmapped sweeps
        # (the PDE dense path's pattern, objectives/pde.py), and the
        # speculative trial wave calls the K-row batch directly.  Elementwise
        # vmap keeps every lane's arithmetic identical, so this changes no
        # mathematical semantics; the trapezoid reduction becomes a
        # row-reduction at K ≥ 2, which is batch-size invariant on TPU.
        # ys comes back TIME-major (nt, K, n) — out_axes=1 keeps the vmapped
        # scan's natural stacking (no trailing moveaxis, whose fusion into
        # the scan forces scattered per-step stores; the same layout lever
        # as PDEObjective.forward_batch).  Consumers select ``ys[:, k]``.
        vfwd = jax.vmap(forward, out_axes=(0, 1))
        vadj = jax.vmap(adjoint)

        def forward2(x):
            f2, ys2 = vfwd(jnp.stack([x, x]))
            return f2[0], ys2[:, 0]

        def adjoint2(x, ys):
            df2, lam2 = vadj(jnp.stack([x, x]), jnp.stack([ys, ys]))
            return df2[0], lam2[0]

        self._forward = jax.jit(forward2)
        self._adjoint = jax.jit(adjoint2)
        self._forward_batch_ops = jax.jit(vfwd)
        _SWEEP_CACHE[key] = (self._forward, self._adjoint,
                             self._forward_batch_ops)

    def _forward_batch_with(self, xs, ops):
        """K-row batched forward ``xs (K, nt, nx) → (fvals (K,),
        ys (nt, K, n))`` — the speculative trial wave's evaluation path;
        rows bit-match :meth:`_forward_with` (elementwise vmap + K ≥ 2 row
        reductions).  ``ys`` is TIME-major, batch axis second — select
        ``ys[:, k]``."""
        return self._forward_batch_ops(xs)

    # -- protocol hooks --------------------------------------------------------
    def eval_f_impl(self, x, cache: bool):
        fval, ys = self._forward(x)
        return fval, ys

    def eval_f_(self):
        f = super().eval_f_()
        self.state = self._aux
        return f

    def eval_df_impl(self):
        df, lam = self._adjoint(self.x, self._aux)
        self.adjoint = lam
        return df
