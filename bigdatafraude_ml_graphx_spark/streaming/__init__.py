from .source import file_stream, kafka_stream, rate_stream  # noqa: F401
from .transform import parse_json_events, tag_events  # noqa: F401
from .windows import windowed_agg, dedup_stream, dedup_stream_fuzzy_ts  # noqa: F401
from .sinks import (  # noqa: F401
    console_sink,
    memory_sink,
    foreach_batch_sink,
    jdbc_batch_writer,
    parquet_sink,
    run_available_now,
)
from .joins import stream_stream_join  # noqa: F401
from .stateful import running_totals  # noqa: F401
