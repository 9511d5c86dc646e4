"""Incremental materialized-view maintenance: every refresh must equal
a from-scratch recompute over the source's latest snapshot, consume
only the appended rows, and be idempotent under replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.operators.matview import refresh_incremental
from wnv_etl_lab2_spark.sources.versioned import (
    append_table,
    create_table,
    latest_version,
    read_table,
)


def _aggregate(df):
    return df.groupBy("user").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"),
        F.max("v").alias("mx"),
    )


def _merge(state, delta):
    s = state.select(
        "user", F.col("n").alias("n_s"), F.col("sv").alias("sv_s"), F.col("mx").alias("mx_s")
    )
    d = delta.select(
        "user", F.col("n").alias("n_d"), F.col("sv").alias("sv_d"), F.col("mx").alias("mx_d")
    )
    j = s.join(d, "user", "full_outer")
    z = F.lit(0)
    return j.select(
        "user",
        (F.coalesce("n_s", z) + F.coalesce("n_d", z)).alias("n"),
        (F.coalesce("sv_s", F.lit(0).cast("decimal(18,2)"))
         + F.coalesce("sv_d", F.lit(0).cast("decimal(18,2)"))).cast("decimal(18,2)").alias("sv"),
        F.greatest("mx_s", "mx_d").alias("mx"),
    )


def _content(df):
    return {(r.user, r.n, float(r.sv), r.mx) for r in df.collect()}


def test_refresh_tracks_source_and_equals_recompute(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    create_table(
        spark.createDataFrame([("a", 10), ("b", 20), ("a", 5)], "user string, v long"),
        src,
    )
    # first refresh: full build
    assert refresh_incremental(spark, src, view, _aggregate, _merge) == 0
    assert _content(read_table(spark, view)) == _content(
        _aggregate(read_table(spark, src))
    )
    # two appends, one refresh: consumes both deltas at once
    append_table(spark.createDataFrame([("b", 7), ("c", 1)], "user string, v long"), src)
    append_table(spark.createDataFrame([("a", 100)], "user string, v long"), src)
    assert refresh_incremental(spark, src, view, _aggregate, _merge) == 2
    assert _content(read_table(spark, view)) == _content(
        _aggregate(read_table(spark, src))
    )
    # already current: no-op, no new view version
    v_before = latest_version(spark, view)
    assert refresh_incremental(spark, src, view, _aggregate, _merge) is None
    assert latest_version(spark, view) == v_before
    # next append, next refresh
    append_table(spark.createDataFrame([("c", 50)], "user string, v long"), src)
    assert refresh_incremental(spark, src, view, _aggregate, _merge) == 3
    assert _content(read_table(spark, view)) == _content(
        _aggregate(read_table(spark, src))
    )


def test_view_time_travel_shows_refresh_history(spark, tmp_path):
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    create_table(spark.createDataFrame([("a", 1)], "user string, v long"), src)
    refresh_incremental(spark, src, view, _aggregate, _merge)
    snap0 = _content(read_table(spark, view, 0))
    append_table(spark.createDataFrame([("a", 2)], "user string, v long"), src)
    refresh_incremental(spark, src, view, _aggregate, _merge)
    assert _content(read_table(spark, view, 0)) == snap0  # history intact
    assert _content(read_table(spark, view)) != snap0


def test_unstamped_view_gets_full_rebuild_then_incremental(spark, tmp_path):
    """A view created OUTSIDE the refresher carries no source-version
    stamp, so there is no trustworthy incremental baseline: the first
    refresh must full-rebuild (stamped), after which refreshes are
    incremental again."""
    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    create_table(spark.createDataFrame([("a", 1), ("b", 2)], "user string, v long"), src)
    # hand-created, WRONG view content and no stamp
    create_table(
        spark.createDataFrame([("zzz", 999, 999)], "user string, n long, mx long")
        .withColumn("sv", F.lit(999).cast("decimal(18,2)"))
        .select("user", "n", "sv", "mx"),
        view,
    )
    assert refresh_incremental(spark, src, view, _aggregate, _merge) == 0
    assert _content(read_table(spark, view)) == _content(
        _aggregate(read_table(spark, src))
    )
    append_table(spark.createDataFrame([("a", 10)], "user string, v long"), src)
    assert refresh_incremental(spark, src, view, _aggregate, _merge) == 1
    assert _content(read_table(spark, view)) == _content(
        _aggregate(read_table(spark, src))
    )
