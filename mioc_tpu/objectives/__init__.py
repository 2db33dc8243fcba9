from .base import AAOObjective, LazyObjective, Objective
from .ode import ODEObjective

__all__ = ["Objective", "LazyObjective", "AAOObjective", "ODEObjective", "PDEObjective"]


def __getattr__(name):
    if name == "PDEObjective":
        from .pde import PDEObjective

        return PDEObjective
    raise AttributeError(f"module 'mioc_tpu.objectives' has no attribute {name!r}")
