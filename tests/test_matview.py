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


def test_concurrent_refresher_loses_race_and_rebases(spark, tmp_path, monkeypatch):
    """Round-10 advisory fix: a refresher whose delta read races a
    concurrent refresh must FAIL its CAS (pinned view version) and
    rebase — never merge its delta onto a state that already includes
    it (double-apply). Simulated deterministically: the competing
    refresh is injected between this attempt's stamp read and its
    commit, via a one-shot table_appends hook."""
    import wnv_etl_lab2_spark.operators.matview as mv

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    create_table(
        spark.createDataFrame([("a", 10), ("b", 20)], "user string, v long"), src
    )
    assert refresh_incremental(spark, src, view, _aggregate, _merge) == 0
    append_table(spark.createDataFrame([("a", 7), ("c", 1)], "user string, v long"), src)

    real_appends = mv.table_appends
    fired = {"n": 0}

    def racing_appends(s, path, v_from, v_to):
        if fired["n"] == 0:
            fired["n"] = 1
            # the competing refresher commits FIRST (between our stamp
            # read and our commit) — the real, unhooked refresh
            monkeypatch.setattr(mv, "table_appends", real_appends)
            assert mv.refresh_incremental(spark, src, view, _aggregate, _merge) == 1
            monkeypatch.setattr(mv, "table_appends", racing_appends)
        return real_appends(s, path, v_from, v_to)

    monkeypatch.setattr(mv, "table_appends", racing_appends)
    # outer attempt: loses the CAS, with_retries rebases, sees the view
    # already reflects src v1 -> returns None (already current)
    assert refresh_incremental(spark, src, view, _aggregate, _merge) is None
    # and the state equals a from-scratch recompute (no double-apply)
    assert _content(read_table(spark, view)) == _content(
        _aggregate(read_table(spark, src))
    )


def test_overwrite_cas_on_pinned_version_fails_loudly(spark, tmp_path):
    """overwrite_table(expect_latest=stale) must raise, not clobber."""
    import pytest

    from wnv_etl_lab2_spark.sources.versioned import overwrite_table

    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long")
    create_table(df, tbl)
    append_table(spark.createDataFrame([(2,)], "id long"), tbl)  # v1
    with pytest.raises(ValueError, match="optimistic concurrency"):
        overwrite_table(df, tbl, expect_latest=0)
    assert latest_version(spark, tbl) == 1
