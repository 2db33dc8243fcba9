"""Fuller's problem (mintoc.de) — the canonical chattering benchmark.

The reference repo withholds its version (``/root/reference/.gitignore:7-11``
lists a planned ``example_fuller.jl``); this module provides the capability
ahead of that release, designed to the same ``AbstractODEObjective`` contract
(``/root/reference/julia_opt/ODEObjective.jl:243-248``).

Binary variant of Fuller's problem::

    min  ∫₀¹ y₁(t)² dt     s.t.   y₁' = y₂,   y₂' = 1 − 2u,   u(t) ∈ {0, 1}

with y(0) = (0.01, 0).  The unregularized optimal control chatters: it
switches infinitely often in finite time (Fuller 1960), so no bang-bang
control of bounded variation is optimal — exactly the pathology TV
regularization removes.  With β > 0 the TRM returns a finite-switch control
whose switching count grows as β ↓ 0, making this the sharpest stress test of
the TV term among the bundled problems.

The classical statement adds the terminal constraint y(1) = y(0); like the
reference's objectives, this framework models running costs only, so the
constraint is either dropped (default) or imposed softly through the running
cost with ``terminal_weight > 0``, which adds ``w·‖y − y⁰‖²`` restricted to
the final ``terminal_frac`` fraction of the horizon.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..objectives.ode import ODEObjective
from ..ops.levels import product_levels

__all__ = ["FullerObj"]


class FullerObj(ODEObjective):
    def __init__(
        self,
        nt: int = 1000,
        *,
        state0=(0.01, 0.0),
        terminal_weight: float = 0.0,
        terminal_frac: float = 0.05,
        dtype=None,
    ):
        self.terminal_weight = float(terminal_weight)
        self.terminal_frac = float(terminal_frac)
        # numpy: baked as jit literals (no captured device consts).
        self.target = np.asarray(state0, dtype=dtype)
        V = [[0, 1]]
        adm = product_levels(V)
        super().__init__(
            T0=0.0, T1=1.0, nt=nt, state0=state0, V=V, admissible=adm, dtype=dtype
        )

    # Dynamics: double integrator driven by the signed control.
    def F(self, y, u, i):
        return jnp.stack([y[1], 1.0 - 2.0 * u[0]])

    def Fy(self, y, u, i):
        z = jnp.zeros((), dtype=y.dtype)
        return jnp.array([[z, z + 1.0], [z, z]])

    def Fu(self, y, u, i):
        z = jnp.zeros((), dtype=y.dtype)
        return jnp.array([[z], [z - 2.0]])

    # Fused adjoint product (see ODEObjective.FyT_lam): explicit scalar
    # expressions fuse into one op per backward-scan step — materializing
    # the Fy matrix per step fragmented the adjoint into ~100× its cost
    # (round-4 profile), and the vjp default is unroll-bit-unstable on CPU.
    def FyT_lam(self, y, u, lam, i):
        return jnp.stack([jnp.zeros_like(lam[0]), lam[0]])

    def _terminal_mask(self, i):
        # ``i`` is a traced time index inside the sweeps: branch with a
        # select, not Python control flow.
        thresh = self.nt * (1.0 - self.terminal_frac)
        return jnp.where(i >= thresh, 1.0, 0.0)

    # Running cost y₁² (+ optional soft terminal tracking near t = T1).
    def G(self, y, u, i):
        g = y[0] ** 2
        if self.terminal_weight > 0.0:
            on = self._terminal_mask(i)
            g = g + self.terminal_weight * on * jnp.sum((y - self.target) ** 2)
        return g

    def Gy(self, y, u, i):
        gy = jnp.stack([2.0 * y[0], jnp.zeros((), dtype=y.dtype)])
        if self.terminal_weight > 0.0:
            on = self._terminal_mask(i)
            gy = gy + 2.0 * self.terminal_weight * on * (y - self.target)
        return gy

    def Gu(self, y, u, i):
        return jnp.zeros_like(u)
