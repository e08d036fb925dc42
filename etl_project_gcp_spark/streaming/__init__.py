from etl_project_gcp_spark.streaming.streams import (
    read_event_stream,
    run_to_memory_sink,
    streaming_session_agg,
    streaming_tumbling_agg,
)

__all__ = [
    "read_event_stream",
    "streaming_tumbling_agg",
    "streaming_session_agg",
    "run_to_memory_sink",
]
