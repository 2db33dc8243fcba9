"""Total-variation functional for piecewise-constant vector-valued controls.

Reference: ``TV_p`` at ``/root/reference/HelpFunctions.jl:251-273``.
Controls here are time-major: ``u`` has shape ``(nt, M)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .detred import detsum

__all__ = ["tv_p"]


@partial(jax.jit, static_argnames=("p",))
def _tv(u, p: float):
    # Reductions run through batch-invariant fold trees (ops/detred.py) so a
    # vmapped TV (the speculative trial wave) bit-matches the sequential
    # evaluation per lane — a native lane-sum does not on TPU.
    d = jnp.abs(u[1:] - u[:-1])  # (nt-1, M)
    if p == float("inf"):
        return detsum(d.max(axis=-1), axis=-1)
    return detsum(detsum(d**p, axis=-1) ** (1.0 / p), axis=-1)


def tv_p(u, p) -> jnp.ndarray:
    """``TV_p(u) = Σ_i ‖u_i − u_{i−1}‖_p`` over the time axis.

    ``p = inf`` uses the honest per-jump max norm (the reference computes this
    correctly here, ``HelpFunctions.jl:255-258``, even though its DP jump cost
    for ``p = inf`` does not).  ``u is None`` (no integer control) returns 0
    like the ``Nothing`` overload (``HelpFunctions.jl:271-273``).

    Jitted (static ``p``): eager op dispatch degrades the axon TPU runtime
    (see BASELINE_SELF.md), so even this small functional runs compiled.
    """
    if u is None:
        return jnp.asarray(0.0)
    p = float(p)
    if not (p > 0) and p != float("inf"):
        raise ValueError("Only positive p (or inf) are accepted.")
    return _tv(jnp.asarray(u), p)
