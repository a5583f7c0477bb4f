from .inspect import (
    count_exchanges,
    count_exchanges_split,
    executed_plan_str,
    executed_scan_metrics,
    explain_str,
    has_broadcast_hash_join,
    has_codegen,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_exchanges",
    "count_exchanges_split",
    "executed_plan_str",
    "executed_scan_metrics",
    "explain_str",
    "has_broadcast_hash_join",
    "has_codegen",
    "pushed_filters",
    "read_schema_columns",
]
