from wnv_etl_lab2_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    session_windows,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "session_windows",
    "sliding_counts",
    "streaming_dedup",
    "tumbling_counts",
]
