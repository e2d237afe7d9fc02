from .inspect import (  # noqa: F401
    executed_plan,
    formatted_plan,
    has_pushed_filters,
    parquet_scan_count,
    scan_read_schema,
    uses_broadcast_join,
    uses_take_ordered,
    uses_window_group_limit,
    wholestage_codegen_spans,
)
