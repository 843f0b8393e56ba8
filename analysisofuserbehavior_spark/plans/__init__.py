from .audit import (
    count_exchanges,
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_sort_merge_join,
    physical_section,
    pushed_filters,
    read_schema_columns,
    single_partition_window_sorts,
    start_micro_batch_plan_capture,
    stop_micro_batch_plan_capture,
)

__all__ = [
    "count_exchanges",
    "executed_plan",
    "formatted_plan",
    "has_broadcast_join",
    "has_sort_merge_join",
    "physical_section",
    "pushed_filters",
    "read_schema_columns",
    "single_partition_window_sorts",
    "start_micro_batch_plan_capture",
    "stop_micro_batch_plan_capture",
]
