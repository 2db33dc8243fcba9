"""Van der Pol oscillator, binary variant (mintoc.de).

Re-design of ``/root/reference/julia_opt/example_vanderpol.jl``.  The ODE is
unstable: explicit Euler may overflow for coarse grids (warned at
``example_vanderpol.jl:3``); non-finite objective values are treated as
rejected steps by the TRM.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..objectives.ode import ODEObjective, const_dot
from ..ops.levels import bounded_sum_levels

__all__ = ["VPOObj"]


class VPOObj(ODEObjective):
    def __init__(self, nt: int = 2000, *, c=(-1.0, 0.75, -2.0), state0=(1.0, 0.0),
                 dtype=None):
        self.c = np.asarray(c, dtype=dtype)  # numpy: baked as jit literal
        V = [[0, 1], [0, 1], [0, 1]]
        adm = bounded_sum_levels(V, 1, 1)
        super().__init__(
            T0=0.0, T1=20.0, nt=nt, state0=state0, V=V, admissible=adm, dtype=dtype
        )

    # Dynamics (example_vanderpol.jl:48-66).  const_dot keeps the constant
    # mode-coefficient coupling out of the scan body (see its docstring).
    def F(self, y, u, i):
        cu = const_dot(u, self.c)
        return jnp.stack([y[1], (1.0 - y[0] ** 2) * y[1] * cu - y[0]])

    def Fy(self, y, u, i):
        cu = const_dot(u, self.c)
        return jnp.array(
            [[0.0, 1.0], [-2.0 * y[0] * y[1] * cu - 1.0, (1.0 - y[0] ** 2) * cu]]
        )

    def Fu(self, y, u, i):
        return jnp.stack(
            [jnp.zeros_like(self.c), (1.0 - y[0] ** 2) * y[1] * self.c]
        )

    # Fused adjoint product (see ODEObjective.FyT_lam): explicit scalar
    # expressions fuse into one op per backward-scan step — materializing
    # the Fy matrix per step fragmented the adjoint into ~100× its cost
    # (round-4 profile), and the vjp default is unroll-bit-unstable on CPU.
    def FyT_lam(self, y, u, lam, i):
        cu = const_dot(u, self.c)
        return jnp.stack([
            (-2.0 * y[0] * y[1] * cu - 1.0) * lam[1],
            lam[0] + (1.0 - y[0] ** 2) * cu * lam[1],
        ])

    # Objective (example_vanderpol.jl:69-81).
    def G(self, y, u, i):
        return y[0] ** 2 + y[1] ** 2

    def Gy(self, y, u, i):
        return 2.0 * y

    def Gu(self, y, u, i):
        return jnp.zeros_like(u)
