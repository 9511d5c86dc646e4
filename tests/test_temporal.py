"""As-of and bucketed range joins on tiny known inputs (the oracle
queries cover the big-data path; these pin the edge semantics)."""

from __future__ import annotations

import datetime as dt

from wnv_etl_lab2_spark.operators.asof import asof_join, bucketed_range_join


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, ts(5)), (2, 10, ts(10)), (3, 10, ts(0)), (4, 99, ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, ts(2), 2.0), (10, ts(5), 5.0), (10, ts(9), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {r.event_id: r for r in asof_join(left, right, by="user_id").collect()}
    assert out[1].matched_value == 5.0  # exact-tie ts matches (<=)
    assert out[2].matched_value == 9.0  # latest before
    assert out[3].matched_value is None  # nothing at or before
    assert out[4].matched_value is None  # key with no right rows at all


def test_asof_duplicate_right_ts_deterministic(spark):
    """Multiple right rows sharing (key, ts): the window's _tie hash
    makes the pick stable across runs and partitionings — without it,
    F.last returns whichever duplicate the shuffle ordered last."""
    left = spark.createDataFrame(
        [(1, 10, ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, ts(3), 7.0), (10, ts(3), 3.0), (10, ts(3), 11.0)],
        "user_id long, ts timestamp, value double",
    )
    picks = set()
    for n_parts in (1, 4, 16):
        out = asof_join(
            left, right.repartition(n_parts), by="user_id"
        ).collect()
        picks.add(out[0].matched_value)
    assert len(picks) == 1, f"nondeterministic asof pick: {picks}"


def test_range_join_inner_and_left(spark):
    events = spark.createDataFrame(
        [(1, ts(10)), (2, ts(45)), (3, ts(59))], "event_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(100, ts(5), ts(15)), (200, ts(40), ts(50))],
        "window_id long, t_start timestamp, t_end timestamp",
    )
    inner = {
        (r.event_id, r.window_id)
        for r in bucketed_range_join(events, iv, bucket_seconds=600).collect()
    }
    assert inner == {(1, 100), (2, 200)}

    left = bucketed_range_join(events, iv, bucket_seconds=600, how="left").collect()
    by_event = {}
    for r in left:
        by_event.setdefault(r.event_id, []).append(r.window_id)
    assert by_event[1] == [100]
    assert by_event[2] == [200]
    assert by_event[3] == [None]  # unmatched row SURVIVES a left join


def test_asof_null_keys_do_not_match(spark):
    left = spark.createDataFrame(
        [(1, None, ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(None, ts(5), 5.0)], "user_id long, ts timestamp, value double"
    )
    out = asof_join(left, right, by="user_id").collect()
    assert len(out) == 1 and out[0].matched_value is None  # NULL != NULL


def test_range_join_rejects_unsupported_outer(spark):
    import pytest as _pytest

    events = spark.createDataFrame([(1, ts(10))], "event_id long, ts timestamp")
    iv = spark.createDataFrame(
        [(100, ts(5), ts(15))], "window_id long, t_start timestamp, t_end timestamp"
    )
    with _pytest.raises(ValueError, match="unsupported"):
        bucketed_range_join(events, iv, how="full")


def test_range_join_boundary_inclusive(spark):
    events = spark.createDataFrame([(1, ts(15))], "event_id long, ts timestamp")
    iv = spark.createDataFrame(
        [(100, ts(5), ts(15))], "window_id long, t_start timestamp, t_end timestamp"
    )
    out = bucketed_range_join(events, iv, bucket_seconds=60).collect()
    assert [(r.event_id, r.window_id) for r in out] == [(1, 100)]  # t_end inclusive
