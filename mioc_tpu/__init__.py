"""mioc_tpu — a TPU-native framework for mixed-integer optimal control with
total-variation regularization.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the Julia toolbox
accompanying *Vector-Valued Integer Optimal Control with TV Regularization*
(Marko & Wachsmuth 2024, arXiv:2411.06856; reference mounted at
``/root/reference``).  Layer map (cf. SURVEY.md §1):

* :mod:`mioc_tpu.ops`        — admissible-set enumeration, TV functional and the
  Bellman DP subproblem (min-plus scan + Pallas kernel).
* :mod:`mioc_tpu.objectives` — objective protocol and the ODE/PDE dynamics
  adapters (forward-Euler / implicit-Euler ``lax.scan`` sweeps with discrete
  adjoints).
* :mod:`mioc_tpu.solvers`    — the trust-region method (TRM) and smooth
  line-search optimizers.
* :mod:`mioc_tpu.models`     — the five bundled benchmark problems.
* :mod:`mioc_tpu.fem`        — 2D triangular FEM toolkit (mesh, Lagrange P1-P3,
  quadrature, vectorized assembly).
* :mod:`mioc_tpu.parallel`   — device-mesh sharding of the DP and batched solves.
* :mod:`mioc_tpu.utils`      — init controls, IO (.dat/VTK/checkpoints),
  logging, plotting.

Conventions: all time-dependent arrays are **time-major** ``(nt, ...)`` (the
reference is control-major ``(nx, nt)``); level combinations are enumerated
into dense ``(L, M)`` tables at problem construction.
"""

from . import ops
from .ops import (
    AdmissibleSet,
    bounded_sum_levels,
    jump_cost_table,
    product_levels,
    tv_p,
)

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy submodule access to keep `import mioc_tpu` light.
    import importlib

    if name in {
        "objectives",
        "solvers",
        "models",
        "fem",
        "parallel",
        "utils",
    }:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'mioc_tpu' has no attribute {name!r}")
