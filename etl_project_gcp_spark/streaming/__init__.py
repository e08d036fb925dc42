from etl_project_gcp_spark.streaming.streams import (
    incremental_rollup,
    streaming_dedup,
    streaming_forward_fill,
    streaming_interval_join,
    streaming_merge_upsert,
    read_event_stream,
    run_to_memory_sink,
    stateful_sessionize,
    streaming_session_agg,
    streaming_tumbling_agg,
)

__all__ = [
    "incremental_rollup",
    "streaming_dedup",
    "streaming_forward_fill",
    "streaming_interval_join",
    "streaming_merge_upsert",
    "read_event_stream",
    "streaming_tumbling_agg",
    "streaming_session_agg",
    "stateful_sessionize",
    "run_to_memory_sink",
]
