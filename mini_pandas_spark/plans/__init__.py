"""Plan inspection utilities."""

from .inspect import (
    broadcast_join_count,
    iter_executed_nodes,
    scan_output_rows,
    codegen_stage_count,
    executed_plan,
    has_cartesian_product,
    has_pushed_filters,
    python_eval_nodes,
    shuffle_count,
    uses_take_ordered,
)

__all__ = [
    "executed_plan",
    "iter_executed_nodes",
    "scan_output_rows",
    "shuffle_count",
    "broadcast_join_count",
    "has_pushed_filters",
    "has_cartesian_product",
    "python_eval_nodes",
    "codegen_stage_count",
    "uses_take_ordered",
]
