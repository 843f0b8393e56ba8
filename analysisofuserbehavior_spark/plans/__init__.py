from .audit import (
    count_exchanges,
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_sort_merge_join,
    pushed_filters,
    read_schema_columns,
    single_partition_window_sorts,
)

__all__ = [
    "count_exchanges",
    "executed_plan",
    "formatted_plan",
    "has_broadcast_join",
    "has_sort_merge_join",
    "pushed_filters",
    "read_schema_columns",
    "single_partition_window_sorts",
]
