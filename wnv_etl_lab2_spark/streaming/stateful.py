"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows cover time-bucketed aggregation; this covers the
genuinely custom case: per-key state that evolves with every batch.
The operator keeps a running (count, sum, max) per user and emits one
row per user per micro-batch in which that user appeared — the shape
of online feature maintenance in a training-data pipeline.

State is a fixed-width tuple (bounded per key). With a watermark the
operator registers an event-time timeout per key: keys silent past
the horizon are dropped — state is O(active keys), never O(keys ever
seen), which is the 100 TB contract. Without a watermark (bounded
replays, tests) state simply lives for the run.

Note on the state-v2 API: Spark 4's `transformWithStateInPandas`
(typed ValueState/ListState handles + timers on RocksDB) is the
successor surface for new operators, but its Python state-server
protocol requires the google.protobuf runtime, which this container
does not ship — attempting it fails at worker init with
"cannot import name 'descriptor' from 'google.protobuf'". The repo
therefore standardizes on `applyInPandasWithState`, which carries the
same per-key-state semantics over Arrow with no extra dependency; the
migration is mechanical (state tuple -> ValueState, timeout ->
registered timer) when the runtime is available.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for callers)
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"

# event-time horizon past the watermark after which an idle key's
# state is dropped (only applies when the stream has a watermark)
IDLE_TIMEOUT_MS = 2 * 60 * 60 * 1000


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle past the horizon: drop the key's state, emit nothing
        state.remove()
        return
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    max_ts_ms = 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            max_ts_ms = max(max_ts_ms, int(pd.Timestamp(batch_max).value // 1_000_000))
    state.update((n, total, mx))
    try:
        # only legal under EventTimeTimeout (watermarked run); under
        # NoTimeout the state API rejects both calls
        state.setTimeoutTimestamp(max_ts_ms + IDLE_TIMEOUT_MS)
    except Exception:
        pass
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_stats(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Streaming running stats per user (update output mode).

    Pass ``watermark`` (e.g. "2 hours") on unbounded streams: enables
    the event-time timeout that evicts idle keys' state.
    """
    if watermark:
        events = events.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
