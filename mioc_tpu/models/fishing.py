"""Lotka-Volterra multimode fishing problem (mintoc.de).

Re-design of ``/root/reference/julia_opt/example_fishing.jl``: three binary
SOS1 controls select a fishing mode; tracking objective ½‖y − 1‖².
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..objectives.ode import ODEObjective, const_dot
from ..ops.levels import bounded_sum_levels

__all__ = ["LVMObj"]


class LVMObj(ODEObjective):
    def __init__(
        self,
        nt: int = 1200,
        *,
        alpha=1.0,
        beta=1.0,
        gamma=1.0,
        delta=1.0,
        c1=1.0,
        c2=1.0,
        v1=(0.2, 0.4, 0.01),
        v2=(0.1, 0.2, 0.1),
        state0=(0.5, 0.7),
        dtype=None,
    ):
        self.alpha, self.beta = float(alpha), float(beta)
        self.gamma, self.delta = float(gamma), float(delta)
        self.c1, self.c2 = float(c1), float(c2)
        # numpy: baked as jit literals (no captured device consts).
        self.v1 = np.asarray(v1, dtype=dtype)
        self.v2 = np.asarray(v2, dtype=dtype)
        V = [[0, 1], [0, 1], [0, 1]]
        # Exactly one active control at each timestep (example_fishing.jl:24).
        adm = bounded_sum_levels(V, 1, 1)
        super().__init__(
            T0=0.0, T1=12.0, nt=nt, state0=state0, V=V, admissible=adm, dtype=dtype
        )

    # Dynamics (example_fishing.jl:56-76).  The v1/v2 couplings use
    # const_dot (scalar immediates) so the per-step scan bodies carry no
    # tiny constant buffers — see its docstring for the measured 1.60×.
    def F(self, y, u, i):
        return jnp.stack(
            [
                y[0] * (self.alpha - self.beta * y[1]
                        - self.c1 * const_dot(u, self.v1)),
                y[1] * (-self.gamma + self.delta * y[0]
                        - self.c2 * const_dot(u, self.v2)),
            ]
        )

    def Fy(self, y, u, i):
        return jnp.array(
            [
                [
                    self.alpha - self.beta * y[1]
                    - self.c1 * const_dot(u, self.v1),
                    -self.beta * y[0],
                ],
                [
                    self.delta * y[1],
                    -self.gamma + self.delta * y[0]
                    - self.c2 * const_dot(u, self.v2),
                ],
            ]
        )

    def Fu(self, y, u, i):
        return jnp.stack([-self.c1 * y[0] * self.v1, -self.c2 * y[1] * self.v2])

    # Fused adjoint product (see ODEObjective.FyT_lam): explicit scalar
    # expressions fuse into one op per backward-scan step — materializing
    # the Fy matrix per step fragmented the adjoint into ~100× its cost
    # (round-4 profile), and the vjp default is unroll-bit-unstable on CPU.
    def FyT_lam(self, y, u, lam, i):
        return jnp.stack([
            (self.alpha - self.beta * y[1]
             - self.c1 * const_dot(u, self.v1)) * lam[0]
            + self.delta * y[1] * lam[1],
            -self.beta * y[0] * lam[0]
            + (-self.gamma + self.delta * y[0]
               - self.c2 * const_dot(u, self.v2)) * lam[1],
        ])

    # Tracking objective (example_fishing.jl:79-92).
    def G(self, y, u, i):
        return 0.5 * (y[0] - 1.0) ** 2 + 0.5 * (y[1] - 1.0) ** 2

    def Gy(self, y, u, i):
        return y - 1.0

    def Gu(self, y, u, i):
        return jnp.zeros_like(u)
