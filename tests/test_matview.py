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


# ---- delta-join maintenance (round 10): view = agg(A JOIN B) ----


def _join(a, b):
    return a.join(b, "k")


def _jagg(df):
    return df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qty").cast("decimal(18,2)")).alias("sq"),
    )


def _jmerge(state, delta):
    s = state.select("grp", F.col("n").alias("n_s"), F.col("sq").alias("sq_s"))
    d = delta.select("grp", F.col("n").alias("n_d"), F.col("sq").alias("sq_d"))
    j = s.join(d, "grp", "full_outer")
    zero = F.lit(0).cast("decimal(18,2)")
    return j.select(
        "grp",
        (F.coalesce("n_s", F.lit(0)) + F.coalesce("n_d", F.lit(0))).alias("n"),
        (F.coalesce("sq_s", zero) + F.coalesce("sq_d", zero))
        .cast("decimal(18,2)")
        .alias("sq"),
    ).where(F.col("n") > 0)


def _jcontent(df):
    return {(r.grp, r.n, float(r.sq)) for r in df.collect()}


def test_join_view_refresh_equals_recompute_after_either_side_appends(
    spark, tmp_path
):
    """The delta-join rule dV = dA JOIN B1 UNION A0 JOIN dB: refresh ==
    from-scratch recompute after appends to A only, B only, and both."""
    from wnv_etl_lab2_spark.operators.matview import refresh_incremental_join

    a, b, view = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "view")
    create_table(
        spark.createDataFrame([(1, "x", 10), (2, "y", 20)], "k long, grp string, qty long"),
        a,
    )
    create_table(spark.createDataFrame([(1,), (2,)], "k long"), b)

    def recompute():
        return _jagg(_join(read_table(spark, a), read_table(spark, b)))

    # full build
    assert refresh_incremental_join(
        spark, a, b, view, _join, _jagg, _jmerge
    ) == (0, 0)
    assert _jcontent(read_table(spark, view)) == _jcontent(recompute())

    # append to A only (k=2 joins existing B row; k=9 dangles)
    append_table(
        spark.createDataFrame([(2, "y", 7), (9, "z", 1)], "k long, grp string, qty long"), a
    )
    assert refresh_incremental_join(
        spark, a, b, view, _join, _jagg, _jmerge
    ) == (1, 0)
    assert _jcontent(read_table(spark, view)) == _jcontent(recompute())

    # append to B only (k=9 now matches the dangling A row)
    append_table(spark.createDataFrame([(9,)], "k long"), b)
    assert refresh_incremental_join(
        spark, a, b, view, _join, _jagg, _jmerge
    ) == (1, 1)
    assert _jcontent(read_table(spark, view)) == _jcontent(recompute())

    # append to BOTH before one refresh: dA x dB must count exactly once
    append_table(
        spark.createDataFrame([(9, "z", 100), (5, "w", 3)], "k long, grp string, qty long"), a
    )
    append_table(spark.createDataFrame([(5,), (1,)], "k long"), b)
    assert refresh_incremental_join(
        spark, a, b, view, _join, _jagg, _jmerge
    ) == (2, 2)
    assert _jcontent(read_table(spark, view)) == _jcontent(recompute())

    # replay / already current
    assert refresh_incremental_join(spark, a, b, view, _join, _jagg, _jmerge) is None


def test_join_view_stamp_records_both_versions(spark, tmp_path):
    from wnv_etl_lab2_spark.operators.matview import refresh_incremental_join
    from wnv_etl_lab2_spark.sources.versioned import last_stamp

    a, b, view = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "view")
    create_table(spark.createDataFrame([(1, "x", 1)], "k long, grp string, qty long"), a)
    create_table(spark.createDataFrame([(1,)], "k long"), b)
    refresh_incremental_join(spark, a, b, view, _join, _jagg, _jmerge)
    append_table(spark.createDataFrame([(1, "x", 2)], "k long, grp string, qty long"), a)
    refresh_incremental_join(spark, a, b, view, _join, _jagg, _jmerge)
    assert last_stamp(spark, view, "matview-join") == {"a": 1, "b": 0}
    # the stamp is versioned with the view: as-of the first refresh
    assert last_stamp(spark, view, "matview-join", as_of=0) == {"a": 0, "b": 0}


# ---- CDF-backed maintenance across history rewrites (round 10) ----


def _cagg(df):
    return df.groupBy("user").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"),
    )


def _cmerge_signed(sign):
    zero = F.lit(0).cast("decimal(18,2)")

    def op(state, delta):
        s = state.select("user", F.col("n").alias("n_s"), F.col("sv").alias("sv_s"))
        d = delta.select("user", F.col("n").alias("n_d"), F.col("sv").alias("sv_d"))
        j = s.join(d, "user", "full_outer")
        return j.select(
            "user",
            (F.coalesce("n_s", F.lit(0)) + sign * F.coalesce("n_d", F.lit(0))).alias("n"),
            (F.coalesce("sv_s", zero) + sign * F.coalesce("sv_d", zero))
            .cast("decimal(18,2)")
            .alias("sv"),
        ).where(F.col("n") > 0)

    return op


def test_cdf_refresh_survives_history_rewrites(spark, tmp_path):
    """The rewrite-tolerant refresher: after an append, a merge-upsert
    (update + insert), and a delete — all of which table_appends
    refuses — the retract/apply refresh equals a from-scratch
    recompute, and replays are skipped."""
    from wnv_etl_lab2_spark.operators.matview import refresh_incremental_cdf
    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        merge_upsert_table,
    )

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    create_table(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id long, user string, v long"
        ),
        src,
    )
    merge, retract = _cmerge_signed(F.lit(1)), _cmerge_signed(F.lit(-1))

    def refresh():
        return refresh_incremental_cdf(
            spark, src, view, "id", _cagg, merge, retract
        )

    def recompute():
        return {(r.user, r.n, float(r.sv)) for r in _cagg(read_table(spark, src)).collect()}

    def view_now():
        return {(r.user, r.n, float(r.sv)) for r in read_table(spark, view).collect()}

    assert refresh() == 0  # full build
    assert view_now() == recompute()

    append_table(spark.createDataFrame([(4, "b", 7)], "id long, user string, v long"), src)
    merge_upsert_table(  # rewrite: update id=2, move id=3 to user a
        spark.createDataFrame([(2, "a", 25), (3, "a", 5)], "id long, user string, v long"),
        src,
        key="id",
    )
    delete_from_table(spark, src, "id = 1")
    assert refresh() == 3  # one refresh absorbs append+merge+delete
    assert view_now() == recompute() == {("a", 2, 30.0), ("b", 1, 7.0)}

    assert refresh() is None  # replay / already current
    # groups whose count hits zero drop out entirely
    delete_from_table(spark, src, "user = 'b'")
    assert refresh() == 4
    assert view_now() == recompute() == {("a", 2, 30.0)}


# ---- delta-join over REWRITING sources (round 11, r10 verdict #4) ----


def _jmerge_signed(sign):
    zero = F.lit(0).cast("decimal(18,2)")

    def op(state, delta):
        s = state.select("grp", F.col("n").alias("n_s"), F.col("sq").alias("sq_s"))
        d = delta.select("grp", F.col("n").alias("n_d"), F.col("sq").alias("sq_d"))
        j = s.join(d, "grp", "full_outer")
        return j.select(
            "grp",
            (F.coalesce("n_s", F.lit(0)) + sign * F.coalesce("n_d", F.lit(0))).alias("n"),
            (F.coalesce("sq_s", zero) + sign * F.coalesce("sq_d", zero))
            .cast("decimal(18,2)")
            .alias("sq"),
        ).where(F.col("n") > 0)

    return op


def test_join_cdf_refresh_survives_rewrites_on_either_source(spark, tmp_path):
    """refresh_incremental_join_cdf: the signed delta-join
    dV = dA JOIN B1 UNION A0 JOIN dB with CDF deltas (retract on
    delete/preimage, apply on insert/postimage) equals a from-scratch
    recompute after (1) a MERGE on A plus an append on B before ONE
    refresh, (2) a DELETE on A plus a MERGE on B, and (3) is a no-op
    on replay — the exact 'Done =' pin of the r10 verdict item 4."""
    from wnv_etl_lab2_spark.operators.matview import refresh_incremental_join_cdf
    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        merge_upsert_table,
    )

    a, b, view = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "view")
    create_table(
        spark.createDataFrame(
            [(1, "x", 10), (2, "y", 20), (3, "z", 5)], "k long, grp string, qty long"
        ),
        a,
    )
    create_table(spark.createDataFrame([(1,), (2,)], "k long"), b)
    merge, retract = _jmerge_signed(F.lit(1)), _jmerge_signed(F.lit(-1))

    def refresh():
        return refresh_incremental_join_cdf(
            spark, a, b, view, "k", "k", _join, _jagg, merge, retract
        )

    def recompute():
        return _jagg(_join(read_table(spark, a), read_table(spark, b)))

    assert refresh() == (0, 0)  # full build
    assert _jcontent(read_table(spark, view)) == _jcontent(recompute())

    # (1) MERGE on A (update k=1's qty, insert dangling k=4) AND an
    # append on B (k=3 now matches; k=4 matches the new A row) before
    # one refresh — dA x dB must count exactly once
    merge_upsert_table(
        spark.createDataFrame([(1, "x", 15), (4, "w", 8)], "k long, grp string, qty long"),
        a,
        key="k",
    )
    append_table(spark.createDataFrame([(3,), (4,)], "k long"), b)
    assert refresh() == (1, 1)
    assert _jcontent(read_table(spark, view)) == _jcontent(recompute())

    # (2) DELETE on A and a MERGE on B in the same refresh window
    delete_from_table(spark, a, "grp = 'y'")
    merge_upsert_table(spark.createDataFrame([(9,)], "k long"), b, key="k")
    assert refresh() == (2, 2)
    assert _jcontent(read_table(spark, view)) == _jcontent(recompute())

    # (3) replay / already current
    assert refresh() is None

    # one more mixed wave: rewrite B's membership (delete a key A still
    # has) while A appends a NEW key (the CDF is keyed — key uniqueness
    # is table_changes' documented contract) — the A0 x dB arm must
    # RETRACT joined rows
    append_table(
        spark.createDataFrame([(9, "x", 2)], "k long, grp string, qty long"), a
    )
    delete_from_table(spark, b, "k = 3")
    assert refresh() == (3, 3)
    assert _jcontent(read_table(spark, view)) == _jcontent(recompute())
