"""Structured Streaming: the streaming plans must agree with their
batch twins when the whole file is replayed through the stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.sources.catalog import load_table
from wnv_etl_lab2_spark.streaming.events import (
    read_events_stream,
    session_windows,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)


@pytest.fixture()
def events_path(spark, sf_dir, tmp_path):
    """Streaming file source needs micros timestamps — re-stage the
    events table (the raw file is TIMESTAMP(NANOS))."""
    from wnv_etl_lab2_spark.streaming.events import stage_events_for_streaming

    return stage_events_for_streaming(spark, sf_dir, str(tmp_path / "events_stream"))


def _run_to_memory(spark, sdf, name, output_mode):
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_match_batch(spark, sf_dir, events_path):
    stream = read_events_stream(spark, events_path)
    result = _run_to_memory(
        spark, tumbling_counts(stream, "1 hour", "2 hours"), "t_tumbling", "append"
    ).toPandas()

    batch = (
        load_table(spark, "events", sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .toPandas()
    )
    # append mode emits only windows closed by the final watermark —
    # every emitted window must match the batch result exactly.
    assert len(result) > 0
    merged = result.merge(
        batch, on=["window_start", "event_type"], suffixes=("_s", "_b"), how="left"
    )
    assert merged["n_events_b"].notna().all()
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["sum_value_s"] == merged["sum_value_b"]).all()


def test_sliding_counts_match_batch_query(spark, sf_dir, events_path):
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    stream = read_events_stream(spark, events_path)
    result = _run_to_memory(
        spark, sliding_counts(stream, "2 hours", "1 hour"), "t_sliding", "append"
    ).toPandas()
    batch = REGISTRY["sliding_window_batch"].fn(spark, sf_dir).toPandas()
    assert len(result) > 0
    merged = result.merge(
        batch, on=["window_start", "event_type"], suffixes=("_s", "_b"), how="left"
    )
    assert merged["n_events_b"].notna().all()
    assert (merged["n_events_s"] == merged["n_events_b"]).all()


def test_session_windows_emit_closed_sessions(spark, events_path):
    stream = read_events_stream(spark, events_path)
    result = _run_to_memory(
        spark, session_windows(stream, "30 minutes", "2 hours"), "t_sessions", "append"
    ).toPandas()
    assert len(result) > 0
    assert (result["session_end"] > result["session_start"]).all()
    assert (result["n_events"] > 0).all()


def test_foreachbatch_idempotent_sink(spark, events_path, tmp_path):
    """Exactly-once pattern: foreachBatch writes each epoch to a
    deterministic path (overwrite) — a replayed epoch lands on the
    same files instead of duplicating rows."""
    out = str(tmp_path / "epochs")
    stream = read_events_stream(spark, events_path)

    def write_epoch(df, epoch_id: int):
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    q = (
        stream.writeStream.foreachBatch(write_epoch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    written = spark.read.option("basePath", out).parquet(out)
    total = spark.read.parquet(events_path).count()
    assert written.count() == total
    # replaying the same epoch overwrites, not duplicates
    n0 = spark.read.parquet(f"{out}/epoch=0").count()
    write_epoch(spark.read.parquet(events_path).limit(n0), 0)
    assert spark.read.parquet(f"{out}/epoch=0").count() == n0


def test_streaming_dedup_drops_duplicates(spark, events_path):
    stream = read_events_stream(spark, events_path)
    doubled = stream.union(stream)  # replay everything twice
    result = _run_to_memory(
        spark, streaming_dedup(doubled, "2 hours"), "t_dedup", "append"
    )
    n = result.count()
    distinct_ids = result.select("event_id").distinct().count()
    assert n == distinct_ids > 0


def test_view_click_attribution_matches_batch(spark, sf_dir, events_path):
    from wnv_etl_lab2_spark.streaming.events import view_click_attribution

    stream = read_events_stream(spark, events_path)
    views = stream.where(F.col("event_type") == "view")
    clicks = stream.where(F.col("event_type") == "click")
    got = (
        _run_to_memory(spark, view_click_attribution(views, clicks), "t_attr", "append")
        .toPandas()
        .sort_values(["user_id", "view_id", "click_id"])
        .reset_index(drop=True)
    )

    ev = load_table(spark, "events", sf_dir)
    bv = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    bc = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    want = (
        bv.join(
            bc,
            F.expr(
                "v_user = c_user AND click_ts >= view_ts "
                "AND click_ts <= view_ts + INTERVAL 1 HOUR"
            ),
        )
        .select(F.col("v_user").alias("user_id"), "view_id", "click_id", "view_ts", "click_ts")
        .toPandas()
        .sort_values(["user_id", "view_id", "click_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_stream_static_enrichment_matches_batch(spark, sf_dir, events_path):
    """Stream-static dim join replayed over the whole file must equal
    the identical batch join, and the unbounded side must not be
    state-tracked (stateless join: append mode, no watermark)."""
    from wnv_etl_lab2_spark.streaming.events import enrich_stream_with_dim

    dim = (
        load_table(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    stream = enrich_stream_with_dim(
        read_events_stream(spark, events_path), dim
    ).select("event_id", "user_id", "c_mktsegment")
    got = _run_to_memory(spark, stream, "enriched_events", "append").toPandas()

    batch = (
        spark.read.parquet(events_path)
        .join(dim, "user_id", "left")
        .select("event_id", "user_id", "c_mktsegment")
        .toPandas()
    )
    key = lambda df: sorted(map(tuple, df.fillna("").values.tolist()))
    assert key(got) == key(batch)
    assert len(got) > 0
