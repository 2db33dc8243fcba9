from .init import rand_func, rand_func_cont, rand_func_int
from .io import (
    import_from_latex_format,
    load_checkpoint,
    save_checkpoint,
    save_latex_format,
)
from .julia_rng import JuliaMersenneTwister
from .logging import IterationLog

__all__ = [
    "rand_func",
    "rand_func_cont",
    "rand_func_int",
    "JuliaMersenneTwister",
    "save_latex_format",
    "import_from_latex_format",
    "save_checkpoint",
    "load_checkpoint",
    "IterationLog",
]
