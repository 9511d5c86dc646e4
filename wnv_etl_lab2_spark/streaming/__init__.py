from wnv_etl_lab2_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    streaming_dedup,
    tumbling_counts,
)

__all__ = ["EVENTS_SCHEMA", "read_events_stream", "streaming_dedup", "tumbling_counts"]
