"""Versioned table as a streaming source: history + incremental
appends arrive exactly once, offsets are version numbers, checkpoint
recovery never re-delivers, schema evolution null-fills, history
rewrites refuse."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.sources.versioned import (
    append_table,
    create_table,
    overwrite_table,
)
from wnv_etl_lab2_spark.sources.versioned_stream import VersionedTableStreamSource


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(VersionedTableStreamSource)
    return spark


def _drain(spark, tbl, ckpt, out_sink):
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .load()
        .writeStream.foreachBatch(out_sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_history_then_increments_exactly_once(registered, tmp_path):
    spark = registered
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    create_table(spark.createDataFrame([(0, "a")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(1, "b")], "id long, v string"), tbl)

    got: list[tuple] = []
    sink = lambda df, _bid: got.extend((r.id, r.v) for r in df.collect())  # noqa: E731
    _drain(spark, tbl, ckpt, sink)
    assert sorted(got) == [(0, "a"), (1, "b")]  # full history first

    # new appends while the stream is down; restart from checkpoint
    append_table(spark.createDataFrame([(2, "c")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(3, "d")], "id long, v string"), tbl)
    got.clear()
    _drain(spark, tbl, ckpt, sink)
    assert sorted(got) == [(2, "c"), (3, "d")]  # increments only, no replay

    got.clear()
    _drain(spark, tbl, ckpt, sink)
    assert got == []  # nothing new -> nothing delivered


def test_starting_version_skips_history(registered, tmp_path):
    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0,)], "id long"), tbl)
    append_table(spark.createDataFrame([(1,)], "id long"), tbl)
    append_table(spark.createDataFrame([(2,)], "id long"), tbl)
    got: list[int] = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("startingVersion", "1")
        .load()
        .writeStream.foreachBatch(lambda df, _b: got.extend(r.id for r in df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == [2]  # versions <= 1 already consumed


def test_schema_comes_from_manifest_and_evolution_null_fills(registered, tmp_path):
    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0, "a")], "id long, v string"), tbl)
    append_table(
        spark.createDataFrame([(1, "b", 0.5)], "id long, v string, q double"), tbl
    )
    s = spark.readStream.format("versioned_table").option("path", tbl).load()
    assert [f.name for f in s.schema.fields] == ["id", "v", "q"]
    got = []
    q = (
        s.writeStream.foreachBatch(
            lambda df, _b: got.extend((r.id, r.v, r.q) for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == [(0, "a", None), (1, "b", 0.5)]  # null backfill


def test_history_rewrite_refuses(registered, tmp_path):
    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0,)], "id long"), tbl)
    overwrite_table(spark.createDataFrame([(9,)], "id long"), tbl)
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .start()
    )
    with pytest.raises(Exception, match="append-only"):
        q.processAllAvailable()
    q.stop()


def test_table_to_table_incremental_pipeline(registered, tmp_path):
    """The full composition: versioned SOURCE -> versioned SINK gives
    an incremental table-to-table pipeline — downstream content equals
    upstream after every drain, each drain moves only the new rows,
    and replays are absorbed by the sink's batch ledger."""
    from wnv_etl_lab2_spark.sources.versioned import latest_version, read_table
    from wnv_etl_lab2_spark.streaming.versioned_sink import write_stream_versioned

    spark = registered
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ck")
    create_table(spark.createDataFrame([(0,)], "id long"), src)
    append_table(spark.createDataFrame([(1,)], "id long"), src)

    def drain():
        s = spark.readStream.format("versioned_table").option("path", src).load()
        q = write_stream_versioned(s, dst, ckpt)
        q.processAllAvailable()
        q.stop()

    drain()
    assert {r.id for r in read_table(spark, dst).collect()} == {0, 1}
    v_after_first = latest_version(spark, dst)
    append_table(spark.createDataFrame([(2,)], "id long"), src)
    drain()
    assert {r.id for r in read_table(spark, dst).collect()} == {0, 1, 2}
    # the second drain appended only the increment as new version(s)
    assert latest_version(spark, dst) > v_after_first
    drain()  # no new upstream data -> downstream unchanged
    assert {r.id for r in read_table(spark, dst).collect()} == {0, 1, 2}


def test_stream_reads_pre_r9_full_list_append_manifests(registered, tmp_path):
    """Round-10 advisory fix: legacy (pre-r9) append manifests carry
    the full "files" list — the stream recovers each version's adds as
    a diff against the parent snapshot instead of raising KeyError."""
    import json
    import os

    spark = registered
    tbl = str(tmp_path / "legacy")
    ckpt = str(tmp_path / "ckpt")
    create_table(spark.createDataFrame([(0, "a")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(1, "b")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(2, "c")], "id long, v string"), tbl)
    from wnv_etl_lab2_spark.sources.versioned import _resolve_files

    for ver in (1, 2):
        p = os.path.join(tbl, "_log", f"{ver:08d}.json")
        with open(p) as f:
            m = json.load(f)
        m["files"] = _resolve_files(spark, tbl, ver)
        del m["add"]
        del m["parent"]
        with open(p, "w") as f:
            json.dump(m, f)
        crc = os.path.join(tbl, "_log", f".{ver:08d}.json.crc")
        if os.path.exists(crc):
            os.remove(crc)

    got: list[tuple] = []
    sink = lambda df, _bid: got.extend((r.id, r.v) for r in df.collect())  # noqa: E731
    _drain(spark, tbl, ckpt, sink)
    assert sorted(got) == [(0, "a"), (1, "b"), (2, "c")]


def test_change_feed_streams_through_rewrites(registered, tmp_path):
    """readChangeFeed=true: a stream survives merge/delete/optimize
    rewrites; applying the feed (insert +1, delete -1) as a multiset
    reproduces EXACTLY the final snapshot — the retract-apply identity
    the CDF reconstruction guarantees."""
    from collections import Counter

    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        merge_upsert_table,
        optimize_table,
        read_table,
    )

    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0, "a"), (1, "b")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(2, "c")], "id long, v string"), tbl)
    merge_upsert_table(  # rewrite: update id=1, insert id=3
        spark.createDataFrame([(1, "B"), (3, "d")], "id long, v string"), tbl, key="id"
    )
    delete_from_table(spark, tbl, "id = 0")  # rewrite: drop a row
    optimize_table(spark, tbl)  # data-neutral: must emit NOTHING
    append_table(spark.createDataFrame([(4, "e")], "id long, v string"), tbl)

    state: Counter = Counter()
    seen_types: set[str] = set()
    seen_versions: set[int] = set()

    def apply(df, _bid):
        for r in df.collect():
            seen_types.add(r._change_type)
            seen_versions.add(r._commit_version)
            state[(r.id, r.v)] += (
                1 if r._change_type in ("insert", "update_postimage") else -1
            )

    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    final = Counter((r.id, r.v) for r in read_table(spark, tbl).collect())
    assert +state == final  # retract-apply == snapshot (no negatives left)
    assert not [k for k, n in state.items() if n < 0]
    assert seen_types == {"insert", "delete"}
    # create=0, appends/rewrites 1..3 and 5 emit; 4 (optimize) is
    # skipped as data-neutral
    assert seen_versions == {0, 1, 2, 3, 5}


def test_change_feed_incremental_restart_across_rewrite(registered, tmp_path):
    """A checkpointed CDF stream that stopped BEFORE a rewrite resumes
    cleanly through it and delivers only the rewrite's change set."""
    from collections import Counter

    from wnv_etl_lab2_spark.sources.versioned import merge_upsert_table, read_table

    spark = registered
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    create_table(spark.createDataFrame([(0, "a"), (1, "b")], "id long, v string"), tbl)

    state: Counter = Counter()

    def apply(df, _bid):
        for r in df.collect():
            state[(r.id, r.v)] += (
                1 if r._change_type in ("insert", "update_postimage") else -1
            )

    def drain():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", tbl)
            .option("readChangeFeed", "true")
            .load()
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()
    assert +state == Counter({(0, "a"): 1, (1, "b"): 1})
    merge_upsert_table(
        spark.createDataFrame([(0, "A")], "id long, v string"), tbl, key="id"
    )
    drain()  # resumes from the checkpointed offset, crosses the rewrite
    final = Counter((r.id, r.v) for r in read_table(spark, tbl).collect())
    assert +state == final == Counter({(0, "A"): 1, (1, "b"): 1})


def test_change_feed_maintains_downstream_aggregate(registered, tmp_path):
    """The consumption pattern the change feed exists for: a
    downstream per-key SUM maintained purely by retract/apply over the
    feed (insert adds, delete subtracts) equals a from-scratch
    aggregate of the final snapshot — across append, merge-update,
    and delete."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        merge_upsert_table,
        read_table,
    )

    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id long, k string, v long"
        ),
        tbl,
    )
    append_table(spark.createDataFrame([(4, "b", 7)], "id long, k string, v long"), tbl)
    merge_upsert_table(  # update id=2's value, move id=3 to group a
        spark.createDataFrame([(2, "a", 25), (3, "a", 5)], "id long, k string, v long"),
        tbl,
        key="id",
    )
    delete_from_table(spark, tbl, "id = 1")

    state: dict = defaultdict(lambda: [0, 0])  # k -> [sum_v, n]

    def apply(df, _bid):
        for r in df.collect():
            sgn = 1 if r._change_type == "insert" else -1
            state[r.k][0] += sgn * r.v
            state[r.k][1] += sgn

    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    want = {
        (r.k, r.s, r.n)
        for r in read_table(spark, tbl)
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(k, s, n) for k, (s, n) in state.items() if n != 0}
    assert got == want == {("a", 30, 2), ("b", 7, 1)}


def test_row_level_change_feed_merge_emits_two_rows(registered, tmp_path):
    """Round 11 (r10 verdict #3): a MERGE touching 1 row of a
    MULTI-FILE table, written with change_data=True, streams exactly
    2 change rows (the pre-image retraction + the post-image
    insertion) — O(changed rows), not O(rewritten files) — and the
    retract-apply identity still holds. A checkpointed stream that
    stopped before the rewrite resumes across it."""
    from collections import Counter

    from wnv_etl_lab2_spark.sources.versioned import merge_upsert_table, read_table

    spark = registered
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    rows = [(i, f"v{i}") for i in range(40)]
    create_table(
        spark.createDataFrame(rows, "id long, v string").repartition(8), tbl
    )

    state: Counter = Counter()
    per_version: Counter = Counter()

    def apply(df, _bid):
        for r in df.collect():
            per_version[r._commit_version] += 1
            state[(r.id, r.v)] += (
                1 if r._change_type in ("insert", "update_postimage") else -1
            )

    def drain():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", tbl)
            .option("readChangeFeed", "true")
            .load()
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    drain()  # history: 40 inserts at v0
    assert per_version[0] == 40
    # stream is DOWN: 1-row merge with row-level change data
    merge_upsert_table(
        spark.createDataFrame([(7, "V7")], "id long, v string"),
        tbl,
        key="id",
        change_data=True,
    )
    drain()  # checkpointed restart across the rewrite
    # the rewrite rewrote every file (full-snapshot rewrite) but the
    # feed delivered ONLY the row-level change set
    assert per_version[1] == 2
    assert state[(7, "v7")] == 0 and state[(7, "V7")] == 1
    final = Counter((r.id, r.v) for r in read_table(spark, tbl).collect())
    assert +state == final


def test_row_level_change_feed_delete_and_mixed_modes(registered, tmp_path):
    """One feed mixing granularities: a change_data=True DELETE emits
    exactly the deleted rows; a change_data=False merge on the same
    table falls back to the file-diff reconstruction; retract-apply
    over the mixed feed still equals the snapshot."""
    from collections import Counter

    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        merge_upsert_table,
        read_table,
    )

    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(i, i % 3) for i in range(30)], "id long, grp long"
        ).repartition(6),
        tbl,
    )
    delete_from_table(spark, tbl, "grp = 2", change_data=True)  # v1: 10 rows
    merge_upsert_table(  # v2: no change files -> file-diff fallback
        spark.createDataFrame([(0, 9)], "id long, grp long"), tbl, key="id"
    )

    state: Counter = Counter()
    per_version: Counter = Counter()

    def apply(df, _bid):
        for r in df.collect():
            per_version[r._commit_version] += 1
            state[(r.id, r.grp)] += (
                1 if r._change_type in ("insert", "update_postimage") else -1
            )

    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    assert per_version[1] == 10  # row-level: exactly the deleted rows
    assert per_version[2] > 2  # file-diff fallback: O(rewritten files)
    final = Counter((r.id, r.grp) for r in read_table(spark, tbl).collect())
    assert +state == final
    assert not [k for k, n in state.items() if n < 0]


def _cdf_state(registered, tmp_path, tbl):
    """Drain the change feed; return the retract-apply Counter."""
    from collections import Counter

    state: Counter = Counter()

    def apply(df, _bid):
        for r in df.collect():
            state[(r.id, r.v)] += (
                1 if r._change_type in ("insert", "update_postimage") else -1
            )

    q = (
        registered.readStream.format("versioned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return state


def test_change_feed_dv_then_cow_rewrite_no_double_retract(registered, tmp_path):
    """Round-12 advisory fix: a merge-on-read DELETE followed by a
    copy-on-write rewrite must not retract the DV-deleted rows twice.
    The CoW drops the parent's physical files, which still CONTAIN the
    DV-deleted rows; the file-diff retraction must subtract the parent
    manifest's DV positions or retract-apply goes net-negative."""
    from collections import Counter

    from wnv_etl_lab2_spark.sources.versioned import delete_from_table, read_table

    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c")], "id long, v string"
        ).coalesce(1),
        tbl,
    )
    delete_from_table(spark, tbl, "id = 0", mode="merge_on_read")  # v1: DV only
    delete_from_table(spark, tbl, "id = 1")  # v2: CoW, drops the v0 file

    state = _cdf_state(spark, tmp_path, tbl)
    final = Counter((r.id, r.v) for r in read_table(spark, tbl).collect())
    assert +state == final == Counter({(2, "c"): 1})
    # the regression: id=0 retracted at v1 (DV) AND inside v2's
    # dropped-file retraction -> net -1
    assert not [k for k, n in state.items() if n < 0]


def test_change_feed_restore_across_mor_delete(registered, tmp_path):
    """RESTORE across a merge-on-read DELETE: (a) restoring to the
    pre-delete version re-inserts exactly the DV-deleted positions of
    the KEPT files (same file list, DV delta only); (b) restoring TO a
    DV-bearing version after a full rewrite inserts the restored files
    MINUS their manifest's DV positions."""
    from collections import Counter

    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        overwrite_table,
        read_table,
        restore_table,
    )

    spark = registered

    # (a) kept-file DV delta: v0 create -> v1 MoR delete -> v2 restore v0
    tbl = str(tmp_path / "a")
    create_table(
        spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c")], "id long, v string"
        ).coalesce(1),
        tbl,
    )
    delete_from_table(spark, tbl, "id = 0", mode="merge_on_read")
    restore_table(spark, tbl, 0)
    state = _cdf_state(spark, tmp_path / "a_ck", tbl)
    final = Counter((r.id, r.v) for r in read_table(spark, tbl).collect())
    assert +state == final == Counter({(0, "a"): 1, (1, "b"): 1, (2, "c"): 1})
    assert not [k for k, n in state.items() if n < 0]

    # (b) insert-side DV: v0 create -> v1 MoR delete -> v2 overwrite
    # -> v3 restore v1 (manifest carries the DV)
    tbl = str(tmp_path / "b")
    create_table(
        spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c")], "id long, v string"
        ).coalesce(1),
        tbl,
    )
    delete_from_table(spark, tbl, "id = 0", mode="merge_on_read")
    overwrite_table(spark.createDataFrame([(9, "z")], "id long, v string"), tbl)
    restore_table(spark, tbl, 1)
    state = _cdf_state(spark, tmp_path / "b_ck", tbl)
    final = Counter((r.id, r.v) for r in read_table(spark, tbl).collect())
    assert +state == final == Counter({(1, "b"): 1, (2, "c"): 1})
    assert not [k for k, n in state.items() if n < 0]


def test_read_change_data_batch_range(spark, tmp_path):
    """Batch twin of the row-level feed: read_change_data over a
    version range returns the persisted change rows (plus appends as
    inserts), raises on a rewrite that recorded none, and the
    retract-apply of the range bridges the two snapshots."""
    from collections import Counter

    import pytest as _pytest

    from wnv_etl_lab2_spark.operators.cdf import read_change_data
    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        merge_upsert_table,
        read_table,
    )

    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0, "a"), (1, "b")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(2, "c")], "id long, v string"), tbl)  # v1
    merge_upsert_table(  # v2, row-level
        spark.createDataFrame([(1, "B")], "id long, v string"),
        tbl, key="id", change_data=True,
    )
    delete_from_table(spark, tbl, "id = 0", change_data=True)  # v3, row-level

    feed = read_change_data(spark, tbl, 0)  # (0, latest]
    state: Counter = Counter()
    for r in feed.collect():
        state[(r.id, r.v)] += (
                1 if r._change_type in ("insert", "update_postimage") else -1
            )
    start = Counter((r.id, r.v) for r in read_table(spark, tbl, 0).collect())
    final = Counter((r.id, r.v) for r in read_table(spark, tbl).collect())
    assert start + state == final

    # a rewrite WITHOUT change files poisons only ranges that cross it
    merge_upsert_table(
        spark.createDataFrame([(9, "z")], "id long, v string"), tbl, key="id"
    )  # v4, no change data
    assert read_change_data(spark, tbl, 2, 3).count() == 1  # inside opted-in range
    with _pytest.raises(ValueError, match="no recorded change"):
        read_change_data(spark, tbl, 3)  # crosses v4


def test_vacuum_collects_unreferenced_change_files(spark, tmp_path):
    """Vacuum drops a vacuumed version's change-data dir and keeps a
    kept version's (the manifest 'changes' list is the reference)."""
    import os

    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        merge_upsert_table,
        vacuum_table,
    )

    tbl = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame([(i, "x") for i in range(10)], "id long, v string"), tbl
    )
    delete_from_table(spark, tbl, "id = 0", change_data=True)  # v1
    merge_upsert_table(
        spark.createDataFrame([(1, "Y")], "id long, v string"),
        tbl, key="id", change_data=True,
    )  # v2
    cdirs = sorted(os.listdir(os.path.join(tbl, "_changes")))
    assert [d.split("-")[0] for d in cdirs] == ["v1", "v2"]
    assert vacuum_table(spark, tbl, keep_last=1) == [0, 1]
    left = sorted(os.listdir(os.path.join(tbl, "_changes")))
    assert [d.split("-")[0] for d in left] == ["v2"]  # v1's dir collected


def test_starting_timestamp_skips_older_commits(registered, tmp_path, monkeypatch):
    """Round 12 (Delta's startingTimestamp): the stream consumes only
    versions committed AFTER the given wall-clock stamp; a stamp older
    than the table streams everything; passing both start options
    raises."""
    import time as _time

    t0 = 1_800_000_000.0
    clock = {"now": t0}
    monkeypatch.setattr(_time, "time", lambda: clock["now"])

    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0,)], "id long"), tbl)
    clock["now"] = t0 + 3600
    append_table(spark.createDataFrame([(1,)], "id long"), tbl)
    clock["now"] = t0 + 7200
    append_table(spark.createDataFrame([(2,)], "id long"), tbl)

    def drain(opts: dict, ck: str) -> list[int]:
        got: list[int] = []
        reader = spark.readStream.format("versioned_table").option("path", tbl)
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(
                lambda df, _b: got.extend(r.id for r in df.collect())
            )
            .option("checkpointLocation", str(tmp_path / ck))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return sorted(got)

    mid = str(int((t0 + 5400) * 1000))
    assert drain({"startingTimestamp": mid}, "ck_mid") == [2]
    early = str(int((t0 - 100) * 1000))
    assert drain({"startingTimestamp": early}, "ck_early") == [0, 1, 2]
    # INCLUSIVE (round-13 advisory fix): a commit stamped EXACTLY at
    # the given timestamp streams — Delta reads changes committed at
    # or after the stamp
    exact = str(int((t0 + 3600) * 1000))
    assert drain({"startingTimestamp": exact}, "ck_exact") == [1, 2]

    import pytest as _pytest

    with _pytest.raises(Exception, match="not both"):
        (
            spark.readStream.format("versioned_table")
            .option("path", tbl)
            .option("startingVersion", "0")
            .option("startingTimestamp", mid)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck_both"))
            .start()
            .processAllAvailable()
        )


def test_stream_stream_interval_join_versioned_dim(registered, tmp_path):
    """Round 13 (r12 verdict #6): the fact stream joined to a
    LATE-ARRIVING dimension-update stream, both read from versioned
    tables — (a) full replay equals the identical batch interval join
    row-for-row, (b) join state is BOUNDED by the watermark: after a
    second wave far past the first wave's horizon, the state store
    holds strictly fewer rows than everything ever streamed (eviction
    happened)."""
    import datetime as dt

    from wnv_etl_lab2_spark.sources.versioned import (
        append_table,
        create_table,
        read_table,
    )
    from wnv_etl_lab2_spark.streaming.events import dim_update_attribution

    spark = registered
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev_rows(base_h, n):
        return [
            (100 + base_h * 10 + i, t0 + dt.timedelta(hours=base_h, minutes=7 * i),
             i % 3, float(i))
            for i in range(n)
        ]

    def dim_rows(base_h, n):
        return [
            (i % 3, t0 + dt.timedelta(hours=base_h, minutes=11 * i), f"seg{base_h}_{i}")
            for i in range(n)
        ]

    ev_schema = "event_id long, ts timestamp, user_id long, value double"
    dim_schema = "user_id long, upd_ts timestamp, segment string"
    facts = str(tmp_path / "facts")
    dims = str(tmp_path / "dims")
    # wave 1: events at hour 0-1, dim updates around the same window
    create_table(spark.createDataFrame(ev_rows(0, 8), ev_schema), facts)
    create_table(spark.createDataFrame(dim_rows(0, 6), dim_schema), dims)

    e_stream = (
        spark.readStream.format("versioned_table").option("path", facts).load()
    )
    d_stream = (
        spark.readStream.format("versioned_table").option("path", dims).load()
    )
    got: list = []
    q = (
        dim_update_attribution(e_stream, d_stream)
        .writeStream.foreachBatch(
            lambda df, _b: got.extend(
                (r.user_id, r.event_id, r.upd_ts, r.segment) for r in df.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    state_wave1 = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    assert state_wave1 > 0  # both sides buffered within the horizon

    # wave 2, 48h later: far past wave 1's watermark + horizon —
    # appending it must EVICT wave-1 state
    append_table(spark.createDataFrame(ev_rows(48, 8), ev_schema), facts)
    append_table(spark.createDataFrame(dim_rows(48, 6), dim_schema), dims)
    q.processAllAvailable()
    state_wave2 = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    total_streamed = 8 + 6 + 8 + 6
    assert state_wave2 < total_streamed  # watermark evicted old state
    q.stop()

    # (a) replay == batch: the SAME plan-builder over the final batch
    # snapshots (withWatermark is a no-op on batch frames)
    want = sorted(
        (r.user_id, r.event_id, r.upd_ts, r.segment)
        for r in dim_update_attribution(
            read_table(spark, facts), read_table(spark, dims)
        ).collect()
    )
    assert sorted(got) == want and len(want) > 0


def test_max_files_per_trigger_bounds_each_batch(registered, tmp_path):
    """Round 13 — Delta's maxFilesPerTrigger: a limited stream drains
    the same rows exactly once but across MANY micro-batches, each
    admitting at most the cap's worth of create/append files (offsets
    gain file granularity inside a version)."""
    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0,)], "id long"), tbl)  # 1 file
    append_table(
        spark.createDataFrame([(i,) for i in range(1, 7)], "id long").repartition(3),
        tbl,
    )  # 3 files x 2 rows
    batches: list[list[int]] = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: batches.append([r.id for r in df.collect()])
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(i for b in batches for i in b)
    assert got == list(range(7))  # exactly once, nothing lost
    nonempty = [b for b in batches if b]
    # one batch per data file (1 create + 3 append files): the cap
    # split the 3-file append across three micro-batches
    assert len(nonempty) == 4


def test_max_bytes_per_trigger_is_a_soft_cap(registered, tmp_path):
    """maxBytesPerTrigger admits files until the byte budget is spent
    but ALWAYS at least one file per batch (Delta's soft-max contract)
    — a 1-byte budget still makes progress, one file at a time."""
    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0,)], "id long"), tbl)
    append_table(
        spark.createDataFrame([(1,), (2,)], "id long").repartition(2), tbl
    )
    batches: list[list[int]] = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("maxBytesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: batches.append([r.id for r in df.collect()])
        )
        .option("checkpointLocation", str(tmp_path / "ckb"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(i for b in batches for i in b) == [0, 1, 2]
    assert len([b for b in batches if b]) == 3  # one file each, 3 files


def test_rate_limited_restart_resumes_exactly_once(registered, tmp_path):
    """File-granular offsets survive checkpoint restart: drain a
    limited stream, append more (multi-file), drain again on the SAME
    checkpoint — only the new rows arrive, still under the cap."""
    spark = registered
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    create_table(spark.createDataFrame([(0,)], "id long"), tbl)
    append_table(
        spark.createDataFrame([(1,), (2,)], "id long").repartition(2), tbl
    )

    def drain() -> list[list[int]]:
        batches: list[list[int]] = []
        q = (
            spark.readStream.format("versioned_table")
            .option("path", tbl)
            .option("maxFilesPerTrigger", "1")
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: batches.append([r.id for r in df.collect()])
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return [b for b in batches if b]

    first = drain()
    assert sorted(i for b in first for i in b) == [0, 1, 2]
    append_table(
        spark.createDataFrame([(3,), (4,)], "id long").repartition(2), tbl
    )
    second = drain()
    assert sorted(i for b in second for i in b) == [3, 4]  # no replay
    assert all(len(b) == 1 for b in second)  # cap still enforced


def test_rate_limit_keeps_cdf_rewrites_atomic(registered, tmp_path):
    """A rate-limited CHANGE FEED never splits a rewrite's
    reconstructed change set: the update's retraction and insertion
    land in the SAME micro-batch even under maxFilesPerTrigger=1
    (splitting would let a crash surface half a logical change)."""
    from wnv_etl_lab2_spark.sources.versioned import update_table

    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame([(0, "a"), (1, "b")], "id long, v string"), tbl
    )
    update_table(spark, tbl, {"v": "'B'"}, "id = 1")
    batches: list[list[tuple]] = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: batches.append(
                [(r.id, r.v, r._change_type, r._commit_version) for r in df.collect()]
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckc"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    nonempty = [b for b in batches if b]
    v1 = [
        sorted((r[0], r[1], r[2]) for r in b if r[3] == 1)
        for b in nonempty
        if any(r[3] == 1 for r in b)
    ]
    assert len(v1) == 1  # the whole rewrite arrived in ONE batch
    assert (1, "b", "delete") in v1[0] and (1, "B", "insert") in v1[0]


def test_plain_stream_skips_optimize_commits(registered, tmp_path):
    """Compaction is data-neutral: the plain (non-CDF) stream passes
    an OPTIMIZE version without error and without re-emitting its
    rewritten rows (round 13 — previously it refused)."""
    from wnv_etl_lab2_spark.sources.versioned import optimize_table

    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(0,)], "id long"), tbl)
    append_table(spark.createDataFrame([(1,)], "id long"), tbl)
    optimize_table(spark, tbl, target_files=1)
    append_table(spark.createDataFrame([(2,)], "id long"), tbl)
    got: list[int] = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", tbl)
        .load()
        .writeStream.foreachBatch(
            lambda df, _b: got.extend(r.id for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == [0, 1, 2]  # exactly once, optimize invisible


def test_ignore_deletes_and_skip_change_commits(registered, tmp_path):
    """Delta's append-only escape hatches: ignoreDeletes streams past
    DELETE commits (but still refuses an UPDATE); skipChangeCommits
    streams past any rewrite. Without either option a DELETE fails the
    plain stream loudly."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from wnv_etl_lab2_spark.sources.versioned import (
        delete_from_table,
        update_table,
    )

    spark = registered
    tbl = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame([(0, "a"), (1, "b")], "id long, v string"), tbl
    )
    delete_from_table(spark, tbl, "id = 0")          # v1: rewrite
    append_table(spark.createDataFrame([(2, "c")], "id long, v string"), tbl)

    def drain(ck, **opts):
        got: list[int] = []
        reader = spark.readStream.format("versioned_table").option("path", tbl)
        for k, val in opts.items():
            reader = reader.option(k, val)
        q = (
            reader.load()
            .writeStream.foreachBatch(
                lambda df, _b: got.extend(r.id for r in df.collect())
            )
            .option("checkpointLocation", str(tmp_path / ck))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return got

    with pytest.raises(StreamingQueryException, match="append-only"):
        drain("ck-none")
    # ignoreDeletes: the delete commit is skipped, appends stream —
    # the deleted row id=0 was already emitted by the create version
    # (at-least-once view of deleted rows, Delta's documented contract)
    assert sorted(drain("ck-del", ignoreDeletes="true")) == [0, 1, 2]

    update_table(spark, tbl, {"v": "'X'"}, "id = 1")  # v3: update rewrite
    append_table(spark.createDataFrame([(3, "d")], "id long, v string"), tbl)
    with pytest.raises(StreamingQueryException, match="append-only"):
        drain("ck-del2", ignoreDeletes="true")  # update still refuses
    assert sorted(drain("ck-skip", skipChangeCommits="true")) == [0, 1, 2, 3]


def test_available_now_drains_then_stops_and_restart_drains_delta(
    registered, tmp_path
):
    """Trigger.AvailableNow (round 14 — r13 verdict ask #7): a run
    over a multi-version table equals the batch read and TERMINATES
    on its own; a restart after more appends drains only the delta."""
    from wnv_etl_lab2_spark.sources.versioned import read_table

    spark = registered
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    create_table(spark.createDataFrame([(1,), (2,)], "x long"), tbl)
    for i in range(3, 9):
        append_table(spark.createDataFrame([(i,)], "x long"), tbl)

    got: list[int] = []
    sink = lambda df, _bid: got.extend(r.x for r in df.collect())  # noqa: E731

    def run_available_now() -> None:
        q = (
            spark.readStream.format("versioned_table")
            .option("path", tbl)
            .option("availableNow", "true")
            .option("maxFilesPerTrigger", "2")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)  # catch-up-then-STOP, no q.stop()
        assert not q.isActive

    run_available_now()
    batch = sorted(r.x for r in read_table(spark, tbl).collect())
    assert sorted(got) == batch  # availableNow drain == batch read

    append_table(spark.createDataFrame([(100,)], "x long"), tbl)
    append_table(spark.createDataFrame([(101,)], "x long"), tbl)
    got.clear()
    run_available_now()
    assert sorted(got) == [100, 101]  # restart drains ONLY the delta

    got.clear()
    run_available_now()
    assert got == []  # nothing new -> empty drain, still terminates


def test_available_now_freezes_target_and_paces_under_rate_limit(tmp_path):
    """Unit-level pin of the option's two latestOffset roles: the
    first call captures the full catch-up target; later calls pace
    rate-limited batch ends toward it and never pass it — appends
    landing after the capture wait for the next run (Delta's
    AvailableNow contract)."""
    from pyspark.sql.types import StructType

    from wnv_etl_lab2_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
    )

    # a table only the reader's plain-python log walker touches
    from wnv_etl_lab2_spark import get_spark

    spark = get_spark(app_name="wnv-etl-lab2-tests", cpus=8, shuffle_partitions=8)
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(1,)], "x long"), tbl)
    for i in range(2, 6):
        append_table(spark.createDataFrame([(i,)], "x long"), tbl)

    schema = StructType.fromJson(
        __import__("json").loads(
            __import__(
                "wnv_etl_lab2_spark.sources.versioned", fromlist=["x"]
            )._read_manifest(spark, tbl, 4)["schema"]
        )
    )
    r = VersionedTableStreamReader(
        tbl, schema, -1, max_files=1, available_now=True
    )
    target = r.latestOffset()  # capture call
    assert target == {"version": 4}

    # a concurrent append AFTER capture must not move the target
    append_table(spark.createDataFrame([(99,)], "x long"), tbl)

    ends = []
    prev = r.initialOffset()
    for _ in range(20):
        end = r.latestOffset()
        if end == prev:
            break
        r.partitions(prev, end)
        ends.append(end)
        prev = end
    assert ends[-1] == {"version": 4}  # drained exactly to the target
    assert len(ends) >= 4  # bounded steps, not one giant batch
    assert all(e["version"] <= 4 for e in ends)
