"""Upsert/SCD2 emulation: golden-path and edge cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.operators.scd import merge_upsert, scd2_apply


def test_merge_upsert_last_writer_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21), (2, "b3", 22), (4, "d", 40)], "id long, name string, v long"
    )
    out = {r.id: (r.name, r.v) for r in merge_upsert(target, updates, "id", "v").collect()}
    assert out == {1: ("a", 10), 2: ("b3", 22), 3: ("c", 30), 4: ("d", 40)}


def test_scd2_closes_and_opens_versions(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, "addr_v1", t0, dt.datetime(9999, 12, 31), True),
            (2, "addr_b", t0, dt.datetime(9999, 12, 31), True),
            (3, "addr_old", t0, t1, False),
        ],
        "id long, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "addr_v2", t1)], "id long, addr string, change_ts timestamp"
    )
    out = scd2_apply(dim, changes, "id", tracked_cols=("addr",)).collect()
    rows = {(r.id, r.addr): r for r in out}
    assert len(out) == 4
    closed = rows[(1, "addr_v1")]
    assert not closed.is_current and closed.valid_to == t1
    opened = rows[(1, "addr_v2")]
    assert opened.is_current and opened.valid_from == t1
    assert rows[(2, "addr_b")].is_current  # untouched passes through
    assert not rows[(3, "addr_old")].is_current  # history preserved


def test_scd2_multiple_changes_per_key_chain(spark):
    """Two changes to one key in a single batch must chain into
    consecutive versions with exactly one current row."""
    t0, t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1), dt.datetime(2024, 9, 1)
    dim = spark.createDataFrame(
        [(1, "v1", t0, dt.datetime(9999, 12, 31), True)],
        "id long, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "v2", t1), (1, "v3", t2)], "id long, addr string, change_ts timestamp"
    )
    out = sorted(
        scd2_apply(dim, changes, "id", tracked_cols=("addr",)).collect(),
        key=lambda r: r.valid_from,
    )
    assert [(r.addr, str(r.valid_from)[:10], str(r.valid_to)[:10], r.is_current) for r in out] == [
        ("v1", "2024-01-01", "2024-06-01", False),
        ("v2", "2024-06-01", "2024-09-01", False),
        ("v3", "2024-09-01", "9999-12-31", True),
    ]


def test_merge_upsert_duplicate_order_values_deterministic(spark):
    """Ties on order_col resolve deterministically (hash tie-break),
    not by shuffle order."""
    target = spark.createDataFrame([(1, "a", 0)], "id long, name string, v long")
    updates = spark.createDataFrame(
        [(1, "x", 5), (1, "y", 5)], "id long, name string, v long"
    )
    winners = {
        merge_upsert(target, updates, "id", "v").collect()[0].name for _ in range(3)
    }
    assert len(winners) == 1  # same winner every run


def test_scd2_idempotent_replay_shape(spark):
    """Applying the same change set twice closes the reopened version
    at its own start (zero-length interval) rather than duplicating a
    current row — current count per key stays 1."""
    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [(1, "v1", t0, dt.datetime(9999, 12, 31), True)],
        "id long, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "v2", t1)], "id long, addr string, change_ts timestamp"
    )
    once = scd2_apply(dim, changes, "id", tracked_cols=("addr",))
    twice = scd2_apply(once, changes, "id", tracked_cols=("addr",))
    current = twice.where(F.col("is_current")).collect()
    assert len(current) == 1 and current[0].addr == "v2"


def test_scd2_rejects_stale_changes(spark):
    """A change at or before the open version's valid_from must be
    dropped, not applied — applying it would mint a negative-length
    version overlapping closed history."""
    import datetime as dt

    t0, t1 = dt.datetime(2024, 6, 1), dt.datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [(1, "v1", t0, dt.datetime(9999, 12, 31), True)],
        "id long, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    stale = spark.createDataFrame(
        [(1, "ghost", t1), (1, "same_ts", t0)], "id long, addr string, change_ts timestamp"
    )
    out = scd2_apply(dim, stale, "id", tracked_cols=("addr",)).collect()
    assert len(out) == 1
    assert out[0].addr == "v1" and out[0].is_current
    # a mixed batch applies only the non-stale change
    t2 = dt.datetime(2024, 9, 1)
    mixed = spark.createDataFrame(
        [(1, "ghost", t1), (1, "v2", t2)], "id long, addr string, change_ts timestamp"
    )
    rows = {r.addr: r for r in scd2_apply(dim, mixed, "id", tracked_cols=("addr",)).collect()}
    assert set(rows) == {"v1", "v2"}
    assert not rows["v1"].is_current and rows["v1"].valid_to == t2
    assert rows["v2"].is_current and rows["v2"].valid_from == t2
