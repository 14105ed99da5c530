from basis_devkit_spark.streaming.ops import (
    read_stream_directory,
    tumbling_window_agg,
    sliding_window_agg,
    session_window_agg,
    dedup_within_watermark,
    stream_append_to_store,
    stream_to_managed_table,
    stateful_running_agg,
)

__all__ = [
    "read_stream_directory",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "stream_append_to_store",
    "stream_to_managed_table",
    "stateful_running_agg",
]
