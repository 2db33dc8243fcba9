from .levels import (
    AdmissibleSet,
    bounded_sum_levels,
    jump_cost_table,
    product_levels,
)
from .tv import tv_p
from .bellman import backtrack, build_tables, dp_solve, stage_tables

__all__ = [
    "AdmissibleSet",
    "bounded_sum_levels",
    "jump_cost_table",
    "product_levels",
    "tv_p",
    "backtrack",
    "build_tables",
    "dp_solve",
    "stage_tables",
]
