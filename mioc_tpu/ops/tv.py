"""Total-variation functional for piecewise-constant vector-valued controls.

Reference: ``TV_p`` at ``/root/reference/HelpFunctions.jl:251-273``.
Controls here are time-major: ``u`` has shape ``(nt, M)``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["tv_p"]


def tv_p(u, p) -> jnp.ndarray:
    """``TV_p(u) = Σ_i ‖u_i − u_{i−1}‖_p`` over the time axis.

    ``p = inf`` uses the honest per-jump max norm (the reference computes this
    correctly here, ``HelpFunctions.jl:255-258``, even though its DP jump cost
    for ``p = inf`` does not).  ``u is None`` (no integer control) returns 0
    like the ``Nothing`` overload (``HelpFunctions.jl:271-273``).
    """
    if u is None:
        return jnp.asarray(0.0)
    u = jnp.asarray(u)
    d = jnp.abs(u[1:] - u[:-1])  # (nt-1, M)
    p = float(p)  # the norm parameter is static (jit-branch on host)
    if p == float("inf"):
        return d.max(axis=-1).sum()
    if p > 0:
        return ((d**p).sum(axis=-1) ** (1.0 / p)).sum()
    raise ValueError("Only positive p (or inf) are accepted.")
