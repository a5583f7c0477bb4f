from .inspect import (
    count_exchanges,
    explain_str,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_exchanges",
    "explain_str",
    "has_broadcast_hash_join",
    "pushed_filters",
    "read_schema_columns",
]
