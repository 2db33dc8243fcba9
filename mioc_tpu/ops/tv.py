"""Total-variation functional for piecewise-constant vector-valued controls.

Reference: ``TV_p`` at ``/root/reference/HelpFunctions.jl:251-273``.
Controls here are time-major: ``u`` has shape ``(nt, M)``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["tv_p"]


@partial(jax.jit, static_argnames=("p",))
def _tv_rows(us, p: float):
    """Row-wise TV of a BATCH of controls ``us (K, nt, M) → (K,)``.

    On TPU, row-reduction bits are invariant across batch sizes K ≥ 2 (v5e
    probe, benchmarks/pde_batch_bitexact.py round 4) but differ from the
    unbatched lane-sum lowering — so the single-control :func:`_tv` routes
    through a duplicated 2-row batch of THIS function, making a trial
    wave's vmapped TVs bit-match the sequential loop's at native reduce
    speed (the fold-tree alternative cost ~2 ms/outer-iteration of layout
    ops in the fishing device loop).  The row count is padded to a
    multiple of 8 with zero rows so every call site lowers at the SAME
    width — the 8321-dof banded heat run caught a K=7 wave whose decision
    bits diverged from the duplicated-2-row sequential values (round 5);
    equal widths make the equality structural."""
    K = us.shape[0]
    Kp = -(-max(K, 2) // 8) * 8
    if Kp != K:
        us = jnp.concatenate(
            [us, jnp.zeros((Kp - K,) + us.shape[1:], us.dtype)])
    d = jnp.abs(us[:, 1:] - us[:, :-1])  # (Kp, nt-1, M)
    if p == float("inf"):
        return d.max(axis=-1).sum(axis=-1)[:K]
    return ((d**p).sum(axis=-1) ** (1.0 / p)).sum(axis=-1)[:K]


@partial(jax.jit, static_argnames=("p",))
def _tv(u, p: float):
    return _tv_rows(jnp.stack([u, u]), p)[0]


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
