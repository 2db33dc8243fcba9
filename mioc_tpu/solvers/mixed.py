"""Mixed continuous + integer optimal control (beyond-reference capability).

The reference repository withholds its mixed solver as future work
(``.gitignore:5-11`` lists ``mixed-trust.jl`` and ``example_mixed*``;
SURVEY.md §2.23), but ships all the ingredients: continuous line-search
optimizers, the TV trust-region machinery, and mixed random starts.  This
module assembles them into a block-coordinate solver for

    min_{u, v}  f(u, v) + β·TV_p(v)
    s.t.  umin ≤ u(t) ≤ umax   (continuous block, pointwise bounds)
          v(t) ∈ 𝓥             (integer block, admissible level set)

alternating (i) projected-gradient descent with Armijo backtracking on the
continuous block and (ii) a full TV trust-region solve (Bellman DP subproblem)
on the integer block, until neither block improves.

Objectives: any :class:`~mioc_tpu.objectives.base.LazyObjective` with
``nu > 0``, ``nv > 0``, pointwise bound attributes ``umin``/``umax``
(broadcastable to ``(nt, nu)``) and compiled ``_forward``/``_adjoint`` sweeps
over the full control ``(nt, nu+nv)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..objectives.base import LazyObjective
from ..ops.tv import tv_p
from ..utils.init import rand_func
from .trm import TRMParameters, trm_solve

__all__ = ["MixedParameters", "MixedResult", "mixed_solve"]


@dataclass
class MixedParameters:
    trm: TRMParameters = field(default_factory=TRMParameters)
    rounds: int = 20           # max block alternations
    cont_steps: int = 30       # projected-gradient steps per round
    cont_alpha0: float = 1.0   # initial step size
    cont_beta: float = 0.5     # Armijo backtracking factor
    cont_sigma: float = 1e-4   # Armijo sufficient-decrease fraction
    tol: float = 1e-10         # minimum per-round improvement


@dataclass
class MixedResult:
    J: float                  # f + β·TV_p(v)
    x: np.ndarray             # full control (nt, nu+nv)
    rounds: int
    converged: bool
    history: list             # J after each half-step


class _IntegerBlockView(LazyObjective):
    """Expose the integer block of a mixed objective as a pure-integer
    LazyObjective (the continuous block is held fixed), so the unmodified TRM
    drives the Bellman subproblem on it."""

    def __init__(self, base, u_fixed):
        super().__init__()
        self._base = base
        self._u = jnp.asarray(u_fixed)
        self.T0, self.T1 = base.T0, base.T1
        self.nt, self.tau = base.nt, base.tau
        self.nu, self.nv = 0, base.nv
        self.V = base.V
        self.admissible = base.admissible
        self.dtype = getattr(base, "dtype", None)
        self.x = jnp.asarray(np.asarray(base.x)[:, base.nu :])

    def _full(self, v):
        return jnp.concatenate([self._u, v], axis=1)

    def eval_f_impl(self, v, cache: bool):
        return self._base._forward(self._full(v))

    def eval_df_impl(self):
        df, _ = self._base._adjoint(self._full(self.x), self._aux)
        return df[:, self._base.nu :]


def _project(u, umin, umax):
    return jnp.clip(u, umin, umax)


def _pgd_continuous(base, x, par: MixedParameters):
    """Projected-gradient descent with Armijo on the continuous columns."""
    nu = base.nu
    umin = jnp.broadcast_to(jnp.asarray(base.umin, x.dtype), (base.nt, nu))
    umax = jnp.broadcast_to(jnp.asarray(base.umax, x.dtype), (base.nt, nu))

    u = x[:, :nu]
    v = x[:, nu:]
    f, aux = base._forward(x)
    f = float(f)
    for _ in range(par.cont_steps):
        df, _ = base._adjoint(jnp.concatenate([u, v], axis=1), aux)
        g = df[:, :nu]
        alpha = par.cont_alpha0
        improved = False
        while alpha > 1e-12:
            u_new = _project(u - alpha * g, umin, umax)
            # Sufficient decrease against the projected step length.
            step = u_new - u
            f_new, aux_new = base._forward(jnp.concatenate([u_new, v], axis=1))
            f_new = float(f_new)
            decrease_req = par.cont_sigma * base.tau * float(jnp.sum(g * step))
            if f_new <= f + decrease_req and f_new < f:
                u, f, aux, improved = u_new, f_new, aux_new, True
                break
            alpha *= par.cont_beta
        if not improved:
            break
    return jnp.concatenate([u, v], axis=1), f


def mixed_solve(obj, par: Optional[MixedParameters] = None, x0=None,
                seed: Optional[int] = None) -> MixedResult:
    """Block-coordinate mixed solve; returns the combined objective
    ``f + β·TV_p(v)`` and the full control."""
    par = par or MixedParameters()
    if obj.nu <= 0 or obj.nv <= 0:
        raise ValueError("mixed_solve needs nu > 0 and nv > 0 "
                         "(use trm_solve / opt_optimize for pure problems).")
    if x0 is None:
        x0 = rand_func(obj, seed=seed)
    x = jnp.asarray(x0, dtype=getattr(obj, "dtype", None))
    beta, p = par.trm.beta, par.trm.p

    def total(xc, f):
        return f + beta * float(tv_p(xc[:, obj.nu :], p))

    f, _ = obj._forward(x)
    J = total(x, float(f))
    history = [J]
    converged = False
    rounds_done = 0

    for r in range(par.rounds):
        rounds_done = r + 1
        # (i) continuous block.
        x, f = _pgd_continuous(obj, x, par)
        history.append(total(x, f))

        # (ii) integer block via the TRM (Bellman DP subproblem).
        view = _IntegerBlockView(obj, x[:, : obj.nu])
        res = trm_solve(view, par.trm, x0=np.asarray(x)[:, obj.nu :])
        x = jnp.concatenate([x[:, : obj.nu], jnp.asarray(res.u, x.dtype)], axis=1)
        f = res.f
        history.append(total(x, f))

        if history[-3] - history[-1] <= par.tol:
            converged = True
            break

    obj.x = x
    obj.eval_f_()
    obj.eval_df_()
    return MixedResult(
        J=history[-1], x=np.asarray(x), rounds=rounds_done,
        converged=converged, history=history,
    )
