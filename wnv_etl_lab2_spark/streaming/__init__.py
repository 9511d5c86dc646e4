from wnv_etl_lab2_spark.streaming.documents import (
    DOCUMENTS_SCHEMA,
    read_documents_stream,
    stage_documents_for_streaming,
    streaming_curation,
)
from wnv_etl_lab2_spark.streaming.events import (
    EVENTS_SCHEMA,
    read_events_stream,
    session_windows,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "DOCUMENTS_SCHEMA",
    "read_documents_stream",
    "stage_documents_for_streaming",
    "streaming_curation",
    "EVENTS_SCHEMA",
    "read_events_stream",
    "session_windows",
    "sliding_counts",
    "streaming_dedup",
    "tumbling_counts",
]
