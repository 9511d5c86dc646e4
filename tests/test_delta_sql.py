"""Delta-SQL string surface (round 12 — r11 verdict #4): one table's
full lifecycle driven through SQL strings only, every result equal to
the Python-verb twin run side by side on a second table."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.sources.delta_sql import DeltaSql
from wnv_etl_lab2_spark.sources.versioned import (
    _read_manifest,
    append_table,
    create_table,
    delete_from_table,
    latest_version,
    merge_upsert_table,
    optimize_table,
    purge_deletion_vectors,
    read_table,
    restore_table,
    table_history,
    update_table,
    vacuum_table,
)


def _snap(spark, tbl, version=None):
    return sorted(
        (r.id, r.v, r.score) for r in read_table(spark, tbl, version).collect()
    )


def test_full_lifecycle_sql_equals_python_verbs(spark, tmp_path):
    rows = [(i, f"v{i}", float(i)) for i in range(20)]
    schema = "id long, v string, score double"
    sql_tbl = str(tmp_path / "sql_tbl")
    py_tbl = str(tmp_path / "py_tbl")
    create_table(spark.createDataFrame(rows, schema).repartition(4), sql_tbl)
    create_table(spark.createDataFrame(rows, schema).repartition(4), py_tbl)
    append_table(spark.createDataFrame([(100, "x", 1.0)], schema), sql_tbl)
    append_table(spark.createDataFrame([(100, "x", 1.0)], schema), py_tbl)

    sql = DeltaSql(spark, {"events": sql_tbl})

    # DELETE
    assert sql.run("DELETE FROM events WHERE id % 5 = 0;") == 2
    delete_from_table(spark, py_tbl, "id % 5 = 0")
    assert _snap(spark, sql_tbl) == _snap(spark, py_tbl)

    # UPDATE (multi-assignment, expression with comma inside a call)
    v = sql.run(
        "UPDATE events SET score = score * 2, v = concat(v, '!') WHERE id < 10"
    )
    assert v == 3
    update_table(
        spark, py_tbl, {"score": "score * 2", "v": "concat(v, '!')"}, "id < 10"
    )
    assert _snap(spark, sql_tbl) == _snap(spark, py_tbl)

    # MERGE (upsert via a temp view source)
    ups = spark.createDataFrame([(1, "ONE", 0.0), (999, "new", 9.9)], schema)
    ups.createOrReplaceTempView("updates")
    sql.run(
        "MERGE INTO events AS t USING updates AS s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    merge_upsert_table(ups, py_tbl, key="id")
    assert _snap(spark, sql_tbl) == _snap(spark, py_tbl)

    # SELECT over the latest snapshot goes through spark.sql
    got = sql.run(
        "SELECT count(*) AS n, round(sum(score), 3) AS s FROM events WHERE id < 50"
    ).collect()[0]
    want = (
        read_table(spark, py_tbl)
        .where("id < 50")
        .selectExpr("count(*) AS n", "round(sum(score), 3) AS s")
        .collect()[0]
    )
    assert (got.n, got.s) == (want.n, want.s)

    # SELECT ... VERSION AS OF pins the exact old snapshot
    assert sorted(
        (r.id, r.v, r.score)
        for r in sql.run("SELECT * FROM events VERSION AS OF 2 ORDER BY id").collect()
    ) == _snap(spark, py_tbl, 2)

    # OPTIMIZE ZORDER BY
    sql.run("OPTIMIZE events ZORDER BY (id, score)")
    optimize_table(spark, py_tbl, zorder_by=("id", "score"))
    assert _snap(spark, sql_tbl) == _snap(spark, py_tbl)
    assert (
        _read_manifest(spark, sql_tbl, latest_version(spark, sql_tbl))["op"]
        == "optimize"
    )

    # DESCRIBE HISTORY mirrors table_history
    hist_sql = [(r.version, r.op) for r in sql.run("DESCRIBE HISTORY events").collect()]
    hist_py = [(r.version, r.op) for r in table_history(spark, py_tbl).collect()]
    assert hist_sql == hist_py

    # RESTORE
    sql.run("RESTORE TABLE events TO VERSION AS OF 1")
    restore_table(spark, py_tbl, 1)
    assert _snap(spark, sql_tbl) == _snap(spark, py_tbl)

    # VACUUM DRY RUN lists, deletes nothing; real VACUUM collects
    dry = sql.run("VACUUM events RETAIN 2 VERSIONS DRY RUN")
    assert dry == vacuum_table(spark, py_tbl, keep_last=2, dry_run=True)
    assert latest_version(spark, sql_tbl) == latest_version(spark, py_tbl)
    assert sql.run("VACUUM events RETAIN 2 VERSIONS") == vacuum_table(
        spark, py_tbl, keep_last=2
    )
    assert _snap(spark, sql_tbl) == _snap(spark, py_tbl)


def test_optimize_apply_purge_and_errors(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame(
            [(i, i // 10) for i in range(30)], "id long, grp long"
        ).repartitionByRange(3, "grp"),
        tbl,
    )
    sql = DeltaSql(spark, {"t": tbl})
    delete_from_table(spark, tbl, "grp = 0 AND id < 9", mode="merge_on_read")
    want = {r.id for r in read_table(spark, tbl).collect()}

    v = sql.run("OPTIMIZE t APPLY (PURGE)")
    assert v is not None
    assert purge_deletion_vectors(spark, tbl) is None  # already purged
    m = _read_manifest(spark, tbl, latest_version(spark, tbl))
    assert "dv" not in m or sum(m.get("dv_counts", {}).values()) == 0
    assert {r.id for r in read_table(spark, tbl).collect()} == want

    with pytest.raises(ValueError, match="unknown table"):
        sql.run("DELETE FROM nope WHERE 1=1")
    with pytest.raises(ValueError, match="unsupported"):
        sql.run("CREATE TABLE t2 (id INT)")
    with pytest.raises(ValueError, match="unsupported MERGE"):
        sql.run("MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE")
