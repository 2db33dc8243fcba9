"""Runtime checking helpers (the framework's sanitizer layer).

The reference's only runtime checking is scattered ``@assert``s
(SURVEY.md §5).  Here: jit-safe debug assertions for the solver hot path and
process-wide NaN trapping, all zero-cost unless enabled.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["enable_nan_checks", "assert_admissible", "check_budget"]


def enable_nan_checks(on: bool = True):
    """Trap NaNs produced by any jitted computation (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", bool(on))


def assert_admissible(u, admissible, atol=1e-9) -> bool:
    """Host-side check that every row of ``u (nt, M)`` is an admissible level
    combination.  Returns True or raises AssertionError with the first bad row."""
    u = np.asarray(u)
    levels = np.asarray(admissible.levels)
    d = np.abs(u[:, None, :] - levels[None, :, :]).sum(-1)  # (nt, L)
    bad = np.nonzero(d.min(axis=1) > atol)[0]
    if len(bad):
        raise AssertionError(
            f"control row {bad[0]} = {u[bad[0]]} is not an admissible combination"
        )
    return True


def check_budget(u, u_old, B) -> bool:
    """Host-side check of the trust-region constraint Σ‖u−u_old‖₁ ≤ B."""
    dev = float(np.abs(np.asarray(u) - np.asarray(u_old)).sum())
    if dev > B + 1e-9:
        raise AssertionError(f"trust-region violated: L1 deviation {dev} > B={B}")
    return True
