from .trm import TRM, TRMParameters, TRMResult, trm_solve

__all__ = [
    "TRM",
    "TRMParameters",
    "TRMResult",
    "trm_solve",
    "SteepestDescent",
    "NonlinCG",
    "ArmijoLS",
    "WolfeLS",
    "opt_optimize",
]


def __getattr__(name):
    if name in {"SteepestDescent", "NonlinCG", "ArmijoLS", "WolfeLS",
                "opt_optimize", "LSInitialStatic", "LSInitialLastInc"}:
        from . import continuous

        return getattr(continuous, name)
    raise AttributeError(f"module 'mioc_tpu.solvers' has no attribute {name!r}")
