from .trm import TRM, TRMParameters, TRMResult, trm_solve
from .trm_device import make_device_trm, multistart_solve_device, trm_solve_device
from .mixed import MixedParameters, MixedResult, mixed_solve

__all__ = [
    "MixedParameters",
    "MixedResult",
    "mixed_solve",
    "make_device_trm",
    "multistart_solve_device",
    "trm_solve_device",
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
