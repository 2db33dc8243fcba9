"""Random admissible starting controls.

Re-design of ``rand_func`` / ``rand_func_cont`` / ``rand_func_int``
(``/root/reference/HelpFunctions.jl:136-225``).  Randomness uses numpy
``default_rng`` (the reference seeds a MersenneTwister; bit-level parity with
Julia streams is impossible and not needed — the TRM's golden values are
start-point independent).  Arrays are time-major ``(nt, nx)``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["rand_func", "rand_func_cont", "rand_func_int"]


def rand_func(obj, *, seed: Optional[int] = None, jumps: Optional[int] = None,
              sigma: float = 100.0) -> np.ndarray:
    """Random admissible control: Gaussian-smoothed noise for the continuous
    block, random piecewise-constant admissible levels for the integer block
    (``HelpFunctions.jl:136-148``)."""
    rng = np.random.default_rng(seed)
    x0 = np.zeros((obj.nt, obj.nx))
    if obj.nu > 0:
        x0[:, : obj.nu] = rand_func_cont(obj, rng=rng, sigma=sigma)
    if obj.nv > 0:
        x0[:, obj.nu :] = rand_func_int(obj, rng=rng, jumps=jumps)
    return x0


def rand_func_cont(obj, *, seed=None, rng=None, sigma: float = 100.0) -> np.ndarray:
    """Admissible continuous control from Gaussian-convolved noise, normalized
    into ``[umin, umax]`` and clipped pointwise (``HelpFunctions.jl:158-193``).

    Requires ``obj.umin``/``obj.umax`` of shape ``(nt, nu)``.
    """
    rng = rng if rng is not None else np.random.default_rng(seed)
    nt, nu = obj.nt, obj.nu
    umin = np.broadcast_to(np.asarray(obj.umin, float), (nt, nu))
    umax = np.broadcast_to(np.asarray(obj.umax, float), (nt, nu))

    xi = rng.standard_normal((nu, nt))
    i = np.arange(1, nt + 1)
    kernel = np.exp(-((i - nt / 2.0) ** 2) / (2.0 * sigma**2))
    kernel /= kernel.sum()

    u0 = np.empty((nu, nt))
    for j in range(nu):
        full = np.convolve(xi[j], kernel)
        start = (len(full) - nt) // 2
        u0[j] = full[start : start + nt]

    lo = umin.min(axis=0)  # (nu,)
    hi = umax.max(axis=0)
    span = u0.max(axis=1, keepdims=True) - u0.min(axis=1, keepdims=True)
    # Degenerate smoothing (large sigma / tiny nt) can flatten a row to a
    # constant; normalize those to the bound-interval midpoint instead of 0/0.
    flat = span <= 0.0
    norm = (u0 - u0.min(axis=1, keepdims=True)) / np.where(flat, 1.0, span)
    norm = np.where(flat, 0.5, norm)
    u0 = lo[:, None] + (hi - lo)[:, None] * norm
    return np.clip(u0.T, umin, umax)


def rand_func_int(obj, *, seed=None, rng=None, jumps: Optional[int] = None) -> np.ndarray:
    """Random piecewise-constant admissible integer control with ``jumps``
    uniformly-drawn switch times (``HelpFunctions.jl:204-225``)."""
    rng = rng if rng is not None else np.random.default_rng(seed)
    nt = obj.nt
    if jumps is None:
        jumps = nt // 10
    adm = obj.admissible
    # Switch boundaries: Julia samples from 2…nt (1-based), i.e. 1…nt-1 here.
    t = np.sort(rng.choice(np.arange(1, nt), size=jumps, replace=False))
    seg_combos = rng.integers(0, adm.L, size=jumps + 1)
    seg_of_step = np.searchsorted(t, np.arange(nt), side="right")
    return adm.levels[seg_combos[seg_of_step]]
