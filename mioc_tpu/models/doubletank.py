"""Double-tank multimode problem (mintoc.de).

Re-design of ``/root/reference/julia_opt/example_doubletank.jl``: sqrt outflow
dynamics (state must stay nonnegative), SOS1 inflow modes, tracking objective
``k1 (y2 − k2)²``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..objectives.ode import ODEObjective, const_dot
from ..ops.levels import bounded_sum_levels

__all__ = ["DTMObj"]


class DTMObj(ODEObjective):
    def __init__(self, nt: int = 1000, *, k1=2.0, k2=3.0, c=(1.0, 0.5, 2.0),
                 state0=(2.0, 2.0), dtype=None):
        self.k1, self.k2 = float(k1), float(k2)
        self.c = np.asarray(c, dtype=dtype)  # numpy: baked as jit literal
        V = [[0, 1], [0, 1], [0, 1]]
        adm = bounded_sum_levels(V, 1, 1)
        super().__init__(
            T0=0.0, T1=10.0, nt=nt, state0=state0, V=V, admissible=adm, dtype=dtype
        )

    # Domain-aware FD-check sampling: the sqrt dynamics need y > 0
    # (the reference ships its own test_Fy!/test_Fu! for exactly this,
    # example_doubletank.jl:116-179).
    def sample_point(self, rng):
        y = jnp.asarray(1.0 + 3.0 * rng.random(self.ny), self.dtype)
        u = jnp.asarray(
            self.admissible.levels[rng.integers(self.admissible.L)], self.dtype
        )
        return y, u, int(rng.integers(self.nt))

    # Dynamics (example_doubletank.jl:48-67).  const_dot keeps the constant
    # inflow-coefficient coupling out of the scan body (see its docstring).
    def F(self, y, u, i):
        s1 = jnp.sqrt(y[0])
        return jnp.stack([const_dot(u, self.c) - s1, s1 - jnp.sqrt(y[1])])

    def Fy(self, y, u, i):
        i1 = -1.0 / (2.0 * jnp.sqrt(y[0]))
        return jnp.array([[i1, 0.0], [-i1, -1.0 / (2.0 * jnp.sqrt(y[1]))]])

    def Fu(self, y, u, i):
        return jnp.stack([self.c, jnp.zeros_like(self.c)])

    # Fused adjoint product (see ODEObjective.FyT_lam): explicit scalar
    # expressions fuse into one op per backward-scan step — materializing
    # the Fy matrix per step fragmented the adjoint into ~100× its cost
    # (round-4 profile), and the vjp default is unroll-bit-unstable on CPU.
    def FyT_lam(self, y, u, lam, i):
        i1 = -1.0 / (2.0 * jnp.sqrt(y[0]))
        return jnp.stack([
            i1 * lam[0] - i1 * lam[1],
            (-1.0 / (2.0 * jnp.sqrt(y[1]))) * lam[1],
        ])

    # Objective (example_doubletank.jl:70-82).
    def G(self, y, u, i):
        return self.k1 * (y[1] - self.k2) ** 2

    def Gy(self, y, u, i):
        return jnp.array([0.0, 2.0 * self.k1 * (y[1] - self.k2)])

    def Gu(self, y, u, i):
        return jnp.zeros_like(u)
