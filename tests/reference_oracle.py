"""Pure-numpy transcription of the reference solver — the parity ORACLE.

This module deliberately TRANSCRIBES the Julia reference loop for loop, WITH
its quirks enabled, to serve as an independent oracle for trace-equality
tests (the strongest parity evidence attainable without a Julia runtime):

* ``bellman`` / ``eval_u``: the DP nested loops (HelpFunctions.jl:20-124),
  including the p=inf jump cost ``(sum |d|^inf)^(1/inf)`` that collapses to a
  uniform 1.0 (HelpFunctions.jl:65-67);
* ``tv_p``: the honest TV functional (HelpFunctions.jl:251-268);
* ``trm``: the outer trust-region loop (multi-trust.jl:53-170) with the
  reference's accept/halve/certificate flow and its table-reuse on halving;
* ``OracleODE``: forward Euler + trapezoid + discrete adjoint
  (ODEObjective.jl:125-184);
* ``OracleConv``: the Toeplitz/hat-mass quadratic (example_convolution.jl);
* ``OraclePDE``: implicit Euler with the reference's INEXACT adjoint — Gy at
  the current state, unit weight, Gu skipped on the first column
  (PDEObjective.jl:129-199).

Like ``mioc_tpu/native/bellman_baseline.cpp`` this is a measurement /
verification tool only — it is never part of the solve path.  Arrays are
control-major ``(M, n)`` exactly like the reference; the tests transpose at
the boundary.
"""

from __future__ import annotations

import itertools
import math

import numpy as np


# -- admissible iterators (AdmissibleIterators.jl) ----------------------------

def product_iterator(V):
    """Index tuples over the ragged level array; FIRST component fastest
    (Julia ``Iterators.product`` is column-major)."""
    ranges = [range(len(v)) for v in reversed(V)]
    for tup in itertools.product(*ranges):
        yield tuple(reversed(tup))


def bounded_sum_iterator(V, lb, ub):
    for l in product_iterator(V):
        s = sum(V[m][l[m]] for m in range(len(V)))
        if lb <= s <= ub:
            yield l


# -- TV functional (HelpFunctions.jl:251-273) ---------------------------------

def tv_p(u, p):
    M, n = u.shape
    val = 0.0
    if p == math.inf:
        for i in range(1, n):
            val += np.max(np.abs(u[:, i] - u[:, i - 1]))
    elif p > 0:
        for i in range(1, n):
            val += np.sum(np.abs(u[:, i] - u[:, i - 1]) ** p) ** (1.0 / p)
    else:
        raise ValueError("Only positive p accepted")
    return val


# -- Bellman DP (HelpFunctions.jl:20-83) --------------------------------------

def bellman(grad, u_old, B, beta, p, dt, V, iterator):
    """Backward value recursion; returns (U, Phi) shaped like the reference:
    Phi (B+1, *sizes, 2) double-buffered by time parity; U (M, B+1, *sizes,
    n-1) holding successor index tuples.  ``iterator`` is a list of index
    tuples in enumeration order.  The inner budget loop is vectorized over b
    (pure bookkeeping — tie-breaking is unaffected, the b entries are
    independent); the (i, l, j) loop structure is the reference's."""
    M, n = u_old.shape
    sizes = tuple(len(v) for v in V)
    Phi = np.empty((B + 1,) + sizes + (2,))
    U = np.zeros((M, B + 1) + sizes + (n - 1,), dtype=np.int64)

    def slot(i):
        # Julia's (i+1)%2+1 for 1-based i → 0-based buffer index.
        return (i + 1) % 2

    # Terminal layer i = n (1-based).
    Phi[..., slot(n)] = np.inf
    for l in iterator:
        b = 0
        v1 = 0.0
        for m in range(M):
            numl = V[m][l[m]]
            v1 += dt * grad[m, n - 1] * numl
            b += int(round(abs(numl - u_old[m, n - 1])))
        if b <= B:
            Phi[(b,) + l + (slot(n),)] = v1

    for i in range(n - 1, 0, -1):  # 1-based i = n-1 … 1
        Phi[..., slot(i)] = np.inf
        for l in iterator:
            v1 = 0.0
            btil = 0
            for m in range(M):
                numl = V[m][l[m]]
                v1 += dt * grad[m, i - 1] * numl
                btil += int(round(abs(numl - u_old[m, i - 1])))
            for j in iterator:
                v2 = 0.0
                for m in range(M):
                    v2 += abs(V[m][j[m]] - V[m][l[m]]) ** p
                v2 = v1 + beta * v2 ** (1.0 / p)
                if btil > B:
                    continue
                # b = 0 … B-btil, vectorized (entries independent).
                cand = v2 + Phi[(slice(0, B - btil + 1),) + j + (slot(i + 1),)]
                cur = Phi[(slice(btil, B + 1),) + l + (slot(i),)]
                better = cur > cand
                cur[better] = cand[better]
                for m in range(M):
                    U[(m, slice(btil, B + 1)) + l + (i - 1,)][better] = j[m]
    return U, Phi


def eval_u(u_old, U, Phi, B, V):
    """Forward argmin backtrack (eval_u_TRM!, HelpFunctions.jl:98-124).
    The seed argmin scans Julia column-major: b fastest, then l_1, l_2, …"""
    M, n = u_old.shape
    u = np.empty_like(u_old)
    view = Phi[(slice(0, B + 1),) + (slice(None),) * M + (0,)]
    flat = np.argmin(view.reshape(-1, order="F"))
    idx = np.unravel_index(flat, view.shape, order="F")
    b = int(idx[0])
    l = tuple(int(c) for c in idx[1:])
    for m in range(M):
        u[m, 0] = V[m][l[m]]
    for i in range(1, n):  # 1-based i = 1 … n-1
        l = tuple(int(U[(m, b) + l + (i - 1,)]) for m in range(M))
        for m in range(M):
            u[m, i] = V[m][l[m]]
        b -= int(round(np.abs(u[:, i - 1] - u_old[:, i - 1]).sum()))
    return u


# -- TRM outer loop (multi-trust.jl:53-170) -----------------------------------

def trm(obj, beta, p, delta0, sigma=0.5, kmax=40, maxiter=1000, x0=None):
    """Returns (J_final, u, trace) where trace is one dict per outer
    iteration: {iter, inner, J, pred, ared} — J is the running
    ``J_old + beta*TV_old`` the reference's log prints."""
    n = obj.nt
    dt = obj.tau
    V = obj.V
    iterator = list(obj.iterator)

    u = np.array(x0, dtype=float)
    u_old = u.copy()
    B = int(math.floor(delta0 / dt))

    J = math.inf
    it = 1
    stop = False
    J_old = obj.eval_f_(u)
    trace = []
    U = Phi = None

    while not stop and it <= maxiter:
        delta_k = delta0
        k = 1
        ared, pred = 0.0, 1.0
        halved = False
        TV_old = tv_p(u, p)
        grad = obj.eval_df_()

        while ared < sigma * pred and k <= kmax:
            if halved:
                B_new = int(math.floor(delta_k / dt))
                u = eval_u(u_old, U, Phi, B_new, V)
            else:
                U, Phi = bellman(grad, u_old, B, beta, p, dt, V, iterator)
                u = eval_u(u_old, U, Phi, B, V)

            int_val = 0.0
            for j in range(n):
                int_val += grad[:, j] @ (u_old[:, j] - u[:, j])
            int_val *= dt

            TV_new = tv_p(u, p)
            J_new = obj.eval_f_(u)

            pred = int_val + beta * (TV_old - TV_new)
            ared = J_old - J_new + beta * (TV_old - TV_new)

            if pred <= 0:
                J = J_old
                stop = True
                break  # Julia break skips the k += 1 (multi-trust.jl:130-138)
            elif ared < sigma * pred:
                delta_k /= 2.0
                halved = True
            else:
                u_old = u.copy()
                J_old = J_new
                TV_old = TV_new
                J = J_new
            k += 1

        trace.append(dict(iter=it, inner=k - 1, J=J_old + beta * TV_old,
                          pred=pred, ared=ared))
        it += 1

    obj.eval_df_()  # final derivative "for plotting purposes"
    return J + beta * tv_p(u, p), u, trace


# -- model evaluation oracles --------------------------------------------------

class OracleODE:
    """Forward Euler + trapezoid objective + discrete adjoint
    (ODEObjective.jl:125-184).  F/G/Fy/Fu/Gy/Gu take (i, y, x) with the
    reference's 1-based-style time argument."""

    def __init__(self, *, T0, T1, nt, state0, V, iterator,
                 F, G, Fy, Fu, Gy, Gu):
        self.nt, self.tau = nt, (T1 - T0) / nt
        self.state0 = np.asarray(state0, float)
        self.ny = len(self.state0)
        self.V, self.iterator = V, iterator
        self.F, self.G, self.Fy, self.Fu, self.Gy, self.Gu = F, G, Fy, Fu, Gy, Gu
        self.f_evals = 0
        self.df_evals = 0

    def eval_f_(self, x):
        self.f_evals += 1
        nt, tau = self.nt, self.tau
        state = self.state0.copy()
        self.state = np.empty((self.ny, nt))
        fval = 0.5 * self.G(0, self.state0, x[:, 0])
        for i in range(nt):  # 0-based transcription of :133-148
            state = state + tau * self.F(i, state, x[:, i])
            self.state[:, i] = state
            if i < nt - 1:
                fval += self.G(i + 1, state, x[:, i + 1])
            else:
                fval += 0.5 * self.G(nt - 1, state, x[:, nt - 1])
        self.x = x.copy()
        return fval * tau

    def eval_df_(self):
        self.df_evals += 1
        nt, tau = self.nt, self.tau
        x, state = self.x, self.state
        adj = np.empty((self.ny, nt))
        adj[:, nt - 1] = -0.5 * tau * self.Gy(nt, state[:, nt - 1], x[:, nt - 1])
        for i in range(nt - 1, 0, -1):  # 1-based i = nt-1 … 1
            y, u = state[:, i - 1], x[:, i]
            adj[:, i - 1] = adj[:, i] + tau * (
                self.Fy(i, y, u).T @ adj[:, i] - self.Gy(i, y, u)
            )
        df = np.empty((x.shape[0], nt))
        for i in range(nt):
            y = self.state0 if i == 0 else state[:, i - 1]
            df[:, i] = -self.Fu(i, y, x[:, i]).T @ adj[:, i] \
                + self.Gu(i, y, x[:, i])
        return df


class OracleConv:
    """example_convolution.jl:17-141: K/M/fvec rebuilt from the paper
    formulas, f = .5 (Ku − f)ᵀ M (Ku − f)."""

    def __init__(self, nt=2048, T0=-1.0, T1=1.0):
        self.nt = nt
        self.tau = (T1 - T0) / nt
        self.V = [[-2, -1, 0, 1, 2]]
        self.iterator = list(product_iterator(self.V))
        tau, w0 = self.tau, math.pi

        def int_k(t):
            a = w0 * (t - 1.0) / math.sqrt(2.0)
            return 0.1 * math.exp(-a) * (math.sin(a) + math.cos(a))

        self.fvec = np.array(
            [0.4 * math.cos(2 * math.pi * (T0 + tau * i))
             for i in range(1, nt + 2)]
        )
        K = np.zeros((nt + 1, nt))
        for i in range(2, nt + 2):  # 1-based i = 2 … nt+1
            ti = (i - 1) * tau
            val = int_k(ti) - int_k(ti - tau)
            for j in range(i, nt + 2):  # K[j, j-i+1] 1-based
                K[j - 1, j - i] = val
        self.K = K
        Mm = np.zeros((nt + 1, nt + 1))
        Mm[0, 0] = Mm[nt, nt] = tau / 3
        for i in range(1, nt):
            Mm[i, i] = 2.0 / 3.0 * tau
        for i in range(nt):
            Mm[i, i + 1] = Mm[i + 1, i] = tau / 6
        self.M = Mm
        self.f_evals = 0
        self.df_evals = 0

    def eval_f_(self, x):
        self.f_evals += 1
        self.x = x.copy()
        v = (self.K @ x.T - self.fvec[:, None]).ravel()
        return float(0.5 * v @ self.M @ v)

    def eval_df_(self):
        self.df_evals += 1
        return (self.K.T @ (self.M @ (self.K @ self.x.T
                                      - self.fvec[:, None]))).T


class OraclePDE:
    """Implicit Euler + the reference's inexact adjoint
    (PDEObjective.jl:129-199) on given assembled operators.  ``M``/``A`` are
    scipy sparse, ``F`` (N, nx); densified M⁻¹A / M⁻¹F like
    example_heat.jl:242-262."""

    def __init__(self, *, nt, T0, T1, M, A, F, state0, yd, gamma, V, iterator):
        import scipy.sparse.linalg as spla

        self.nt = nt
        self.tau = (T1 - T0) / nt
        self.V, self.iterator = V, iterator
        self.gamma = gamma
        self.Mc = M.tocsc()
        solve_M = spla.factorized(self.Mc)
        N = self.Mc.shape[0]
        M_invA = np.column_stack([solve_M(np.asarray(A.tocsc()[:, i].todense()).ravel())
                                  for i in range(N)])
        self.M_invF = np.column_stack([solve_M(F[:, i]) for i in range(F.shape[1])])
        self.S = np.eye(N) + self.tau * M_invA
        self.state0 = np.asarray(state0, float)
        self.yd = np.asarray(yd, float)
        self.f_evals = 0
        self.df_evals = 0

    def _G(self, y):
        v = y - self.yd
        return 0.5 * v @ (self.Mc @ v)

    def eval_f_(self, x):
        self.f_evals += 1
        nt, tau = self.nt, self.tau
        x_ext = np.hstack([x, x[:, -1:]])
        state = np.empty((len(self.state0), nt + 1))
        state[:, 0] = self.state0
        for i in range(1, nt + 1):  # impleuler_state!, :129-139
            state[:, i] = np.linalg.solve(
                self.S, state[:, i - 1] + tau * self.M_invF @ x_ext[:, i - 1]
            )
        self.state = state
        self.x = x.copy()
        gt = lambda i: self.gamma * np.sum(x_ext[:, i])
        fval = 0.5 * (self._G(state[:, 0]) + gt(0))
        for i in range(1, nt):
            fval += self._G(state[:, i]) + gt(i)
        fval += 0.5 * (self._G(state[:, nt]) + gt(nt))
        return fval * tau

    def eval_df_(self):
        self.df_evals += 1
        nt, tau = self.nt, self.tau
        N = len(self.state0)
        adj = np.zeros((N, nt + 1))
        ST = self.S.T
        for i in range(nt - 1, -1, -1):  # impleuler_adjoint!, :159-172
            Gy = self.Mc @ (self.state[:, i] - self.yd)
            adj[:, i] = np.linalg.solve(ST, adj[:, i + 1] + tau * Gy)
        df = self.M_invF.T @ adj[:, :nt]
        nx = self.x.shape[0]
        for i in range(1, nt):  # Gu skipped on column 0 (:190-197)
            df[:, i] += self.gamma * np.ones(nx)
        return df
