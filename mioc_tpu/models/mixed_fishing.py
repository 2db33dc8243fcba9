"""Mixed continuous + integer fishing problem (beyond-reference model).

The reference withholds its mixed examples (``.gitignore: example_mixed*``);
this model extends the Lotka-Volterra multimode fishing problem
(``example_fishing.jl``) with ONE bounded continuous control: a supplementary
prey-harvesting rate ``c(t) ∈ [0, cmax]`` with a quadratic effort cost,

    ẏ₁ = y₁(α − βy₂ − c₁·(v·w₁) − c(t)),
    ẏ₂ = y₂(−γ + δy₁ − c₂·(v·w₂)),
    G   = ½(y₁−1)² + ½(y₂−1)² + ρ c(t)²,

with the SOS1 integer mode selection ``v`` unchanged.  Control layout is
``x = [c, v₁, v₂, v₃]`` (continuous block first, like the reference's
``nu``/``nv`` split).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..objectives.ode import ODEObjective
from ..ops.levels import bounded_sum_levels

__all__ = ["LVMMixedObj"]


class LVMMixedObj(ODEObjective):
    def __init__(self, nt: int = 600, *, cmax=0.3, rho=0.05,
                 alpha=1.0, beta=1.0, gamma=1.0, delta=1.0,
                 c1=1.0, c2=1.0, v1=(0.2, 0.4, 0.01), v2=(0.1, 0.2, 0.1),
                 state0=(0.5, 0.7), dtype=None):
        self.alpha, self.beta = float(alpha), float(beta)
        self.gamma, self.delta = float(gamma), float(delta)
        self.c1, self.c2 = float(c1), float(c2)
        self.rho, self.cmax = float(rho), float(cmax)
        self.v1 = np.asarray(v1, dtype=dtype)
        self.v2 = np.asarray(v2, dtype=dtype)
        V = [[0, 1], [0, 1], [0, 1]]
        adm = bounded_sum_levels(V, 1, 1)
        super().__init__(T0=0.0, T1=12.0, nt=nt, state0=state0, nu=1,
                         V=V, admissible=adm, dtype=dtype)
        # Pointwise bounds of the continuous block (rand_func_cont contract).
        self.umin = np.zeros((1,))
        self.umax = np.full((1,), self.cmax)

    def F(self, y, x, i):
        c, v = x[0], x[1:]
        return jnp.stack(
            [
                y[0] * (self.alpha - self.beta * y[1]
                        - self.c1 * (v @ self.v1) - c),
                y[1] * (-self.gamma + self.delta * y[0]
                        - self.c2 * (v @ self.v2)),
            ]
        )

    def G(self, y, x, i):
        return (0.5 * (y[0] - 1.0) ** 2 + 0.5 * (y[1] - 1.0) ** 2
                + self.rho * x[0] ** 2)
