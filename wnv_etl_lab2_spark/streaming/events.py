"""Structured Streaming over the events table (SURVEY.md §7 M5).

The reference's refresh model is delete-and-rerun (`overwriteOutput`,
`Lab2ETL.py:54-60,85`); the streaming extension replaces it with true
incremental processing: file-source replay of the events parquet ->
watermarked event-time windows -> append sink. Tests drive it with
`processAllAvailable()` on a memory sink, which is exactly how the
same plan would run against Kafka at scale (the logical plan is
identical; only the source/sink bindings change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stage_events_for_streaming(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """Re-stage the catalog's events table as microsecond-timestamp
    parquet. Required before read_events_stream: the raw
    events.parquet is TIMESTAMP(NANOS), which the streaming file
    source cannot read against a TimestampType schema (the batch
    catalog converts it on read; a stream's declared schema must match
    the physical type)."""
    from wnv_etl_lab2_spark.sources.catalog import load_table

    load_table(spark, "events", sf_dir).write.mode("overwrite").parquet(out_path)
    return out_path


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over micros-timestamp events parquet (schema
    declared — streaming sources never infer). For the driver-provided
    nanos file, stage first with stage_events_for_streaming."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation: late rows beyond the
    watermark are dropped, state is bounded — the scale contract for
    infinite streams."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregation (each event lands in window/slide
    windows); batch twin is the `sliding_window_batch` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based, the streaming twin of the
    `sessionize_events` batch query): state merges as events arrive,
    closed sessions emit on watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (dropDuplicatesWithinWatermark): the streaming form of exact
    dedup — state bounded by the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def view_click_attribution(
    views: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each click joins the views of the
    same user in the preceding ``horizon`` (ad-attribution shape).
    Both sides are watermarked and the join condition bounds click_ts
    to [view_ts, view_ts + horizon], so state for either side is
    droppable once the watermark passes the horizon — the bounded-state
    contract Structured Streaming requires for stream-stream joins.
    Replaying the whole file must match the identical batch join
    (tests/test_streaming.py)."""
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    joined = v.join(
        c,
        F.expr(
            f"v_user = c_user AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + INTERVAL {horizon}"
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"), "view_id", "click_id", "view_ts", "click_ts"
    )


def dim_update_attribution(
    events: DataFrame,
    dim_updates: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream join of the FACT stream to a LATE-ARRIVING
    dimension-update stream (round 13 — r12 verdict #6): each event
    pairs with every dimension update for its user stamped within
    ``[event_ts - horizon, event_ts]`` — the "which segment changes
    applied to this event" shape where the dimension itself is a
    stream (CDC from an upstream table) that may arrive after the
    facts. Both sides are watermarked and the interval bounds the
    time skew both ways, so EACH side's state is droppable once the
    watermark passes the horizon — the bounded-state contract
    stream-stream joins require (state eviction is pinned in
    tests/test_versioned_stream.py via stateOperators metrics across
    two appended waves). Replaying both versioned-table streams equals
    the identical batch interval join row-for-row.

    At 100 TB: the join shuffles both streams by user_id once; state
    per key is O(rows inside the horizon), independent of history
    length — the watermark, not the table size, bounds memory."""
    e = events.withWatermark("ts", watermark).select(
        F.col("user_id").alias("e_user"),
        F.col("event_id"),
        F.col("ts").alias("event_ts"),
        F.col("value"),
    )
    d = dim_updates.withWatermark("upd_ts", watermark).select(
        F.col("user_id").alias("d_user"),
        F.col("upd_ts"),
        F.col("segment"),
    )
    joined = e.join(
        d,
        F.expr(
            f"e_user = d_user AND upd_ts <= event_ts "
            f"AND upd_ts >= event_ts - INTERVAL {horizon}"
        ),
    )
    return joined.select(
        F.col("e_user").alias("user_id"),
        "event_id", "event_ts", "upd_ts", "segment", "value",
    )


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: enrich the event stream with a dimension
    table. Stateless — no watermark needed; the static side is re-read
    every micro-batch (so slowly-changing dims are picked up on their
    next refresh) and broadcast when small, which is the 100 TB shape:
    the unbounded side never shuffles. Left join keeps events whose
    key has no dim row (parity with the batch lookup-enrichment O4)."""
    return events.join(F.broadcast(dim), on, "left")
