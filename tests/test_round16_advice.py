"""Round-16 protocol fixes (the r15 ADVICE list): rename-aware stream
widening refusal, constant-only DEFAULT validation, standard-order
`DEFAULT expr NOT NULL` parsing, and sidecar-only FSCK repairs not
killing streams."""

from __future__ import annotations

import json as _json

import pytest

from wnv_etl_lab2_spark.sources.delta_sql import DeltaSql
from wnv_etl_lab2_spark.sources.versioned import (
    _read_manifest,
    alter_column_type,
    append_table,
    collect_blooms,
    create_table,
    fsck_repair_table,
    latest_version,
    read_table,
    rename_column,
)


def _schema_at(spark, path, v):
    from pyspark.sql.types import StructType

    return StructType.fromJson(_json.loads(_read_manifest(spark, path, v)["schema"]))


# --------------------------------------- widening hidden by a rename


def test_stream_refuses_widening_hidden_by_rename(spark, tmp_path):
    """The r15 ADVICE scenario: rename a->b AFTER the stream starts,
    then widen b. By logical NAME the widened column misses the
    start-time map (the stream knows it as 'a'), so the pre-fix check
    silently kept the narrow start-time type and post-widening appends
    could mangle out-of-range values. Comparing through the column
    maps' stable PHYSICAL names pairs b(now) with a(start) and
    refuses."""
    from wnv_etl_lab2_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
    )

    path = str(tmp_path / "t")
    create_table(spark.createDataFrame([(1,)], "a int"), path)
    narrow = _schema_at(spark, path, 0)
    r = VersionedTableStreamReader(path, narrow, -1)
    r.partitions(r.initialOffset(), r.latestOffset())  # consume v0

    rename_column(spark, path, "a", "b")  # between start and widening
    alter_column_type(spark, path, "b", "bigint")
    append_table(spark.createDataFrame([(3_000_000_000,)], "b long"), path)

    with pytest.raises(RuntimeError, match="restart the stream"):
        r.partitions({"version": 0}, r.latestOffset())

    # paced path classifies in latestOffset — refuses there too
    r2 = VersionedTableStreamReader(path, narrow, 0, max_files=1)
    with pytest.raises(RuntimeError, match="restart the stream"):
        for _ in range(5):
            r2.partitions(r2.initialOffset(), r2.latestOffset())

    # a fresh stream with the CURRENT (wide, renamed) schema and its
    # start-time column map walks through the widening commit fine
    cur = latest_version(spark, path)
    wide = _schema_at(spark, path, cur)
    r3 = VersionedTableStreamReader(path, wide, -1)
    assert r3.partitions(r3.initialOffset(), r3.latestOffset())


def test_stream_widening_check_ignores_dropped_and_readded_name(
    spark, tmp_path
):
    """Physical-name pairing is also what keeps the check PRECISE: a
    column dropped and re-added under the same logical name is a NEW
    column (fresh physical name) — a later widening commit's schema
    carrying the re-added name at a different type must not be paired
    with the start-time column it never was."""
    from wnv_etl_lab2_spark.sources.versioned import add_column, drop_column
    from wnv_etl_lab2_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
    )

    path = str(tmp_path / "t")
    create_table(
        spark.createDataFrame([(1, 2)], "keep int, c int"), path
    )
    start = _schema_at(spark, path, 0)
    r = VersionedTableStreamReader(path, start, -1)
    r.partitions(r.initialOffset(), r.latestOffset())

    drop_column(spark, path, "c")
    add_column(spark, path, "c", "string")  # same name, NEW column
    # widen an UNRELATED column; the commit's schema carries c:string
    alter_column_type(spark, path, "keep", "bigint")
    append_table(
        spark.createDataFrame([(9_000_000_000, "x")], "keep long, c string"),
        path,
    )
    # 'keep' genuinely widened past the start schema -> refuse mentions
    # keep, never the re-added c (which would be a false pairing)
    with pytest.raises(RuntimeError, match=r"\['keep'\]"):
        r.partitions({"version": 0}, r.latestOffset())


# ------------------------------------------ constant-only DEFAULTs


def test_default_rejects_attribute_references(spark, tmp_path):
    """The r15 ADVICE hole: validation over spark.range(1) exposed a
    column `id`, so DEFAULT id passed DDL and then resolved
    row-dependently at write expansion. The probe is now columnless —
    any attribute reference fails at DDL time."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2)], "id bigint, v int")
    with pytest.raises(ValueError, match="DEFAULT for 'v'"):
        create_table(df, path, defaults={"v": "id"})
    with pytest.raises(ValueError, match="DEFAULT for 'v'"):
        create_table(df, path, defaults={"v": "id + 1"})


def test_default_rejects_nondeterministic_and_context(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "x")], "id bigint, v string")
    for bad in ("rand()", "uuid()", "shuffle(array(1,2))"):
        with pytest.raises(ValueError, match="non-deterministic"):
            create_table(df, str(tmp_path / "nd"), defaults={"v": bad})
    for bad in (
        "current_timestamp()",
        "current_date()",
        "now()",
        "cast(current_timestamp() as string)",
    ):
        with pytest.raises(ValueError, match="statement-time context"):
            create_table(df, str(tmp_path / "ctx"), defaults={"v": bad})
    # a string LITERAL containing a blacklisted word is a constant
    create_table(df, path, defaults={"v": "'now and then'"})
    append_table(
        spark.createDataFrame([(2,)], "id bigint"), path
    )
    # constant expressions (even non-literal, e.g. upper('x')) still OK
    create_table(df, str(tmp_path / "ok"), defaults={"v": "upper('de')"})


# ----------------------------------- DEFAULT expr NOT NULL ordering


def test_create_table_default_before_not_null(spark, tmp_path):
    """Standard SQL order `col INT DEFAULT 5 NOT NULL` — the greedy
    DEFAULT capture used to swallow '5 NOT NULL' and fail with a
    confusing expression-parse error (r15 ADVICE)."""
    path = str(tmp_path / "t")
    sql = DeltaSql(spark, {"t": path})
    sql.run("CREATE TABLE t (id BIGINT, v INT DEFAULT 5 NOT NULL)")
    m = _read_manifest(spark, path, 0)
    assert m["defaults"] == {"v": "5"}
    assert "nn_v" in m.get("constraints", {})
    sql.run("INSERT INTO t (id) VALUES (1)")
    assert [(r.id, r.v) for r in read_table(spark, path).collect()] == [(1, 5)]
    # the NOT NULL constraint actually enforces
    with pytest.raises(ValueError, match="nn_v"):
        sql.run("INSERT INTO t VALUES (2, NULL)")
    # the pre-existing order keeps working and means the same thing
    sql2 = DeltaSql(spark, {"t2": str(tmp_path / "t2")})
    sql2.run("CREATE TABLE t2 (id BIGINT, v INT NOT NULL DEFAULT 5)")
    m2 = _read_manifest(spark, str(tmp_path / "t2"), 0)
    assert m2["defaults"] == {"v": "5"} and "nn_v" in m2["constraints"]
    # DEFAULT NULL stays an expression, not a constraint strip
    sql3 = DeltaSql(spark, {"t3": str(tmp_path / "t3")})
    sql3.run("CREATE TABLE t3 (id BIGINT, v INT DEFAULT NULL)")
    m3 = _read_manifest(spark, str(tmp_path / "t3"), 0)
    assert m3["defaults"] == {"v": "NULL"}
    assert "nn_v" not in m3.get("constraints", {})


# ------------------------------------- sidecar-only fsck vs streams


def test_sidecar_only_fsck_does_not_kill_streams(spark, tmp_path):
    """A blooms-only repair removed zero data files and zero rows —
    logically a metadata shed. Streams skip it like any column-DDL
    commit instead of dying (r15 ADVICE); a repair that DID drop data
    files still refuses."""
    import glob
    import os

    from wnv_etl_lab2_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
    )

    path = str(tmp_path / "t")
    create_table(
        spark.createDataFrame([(i,) for i in range(4)], "id long"), path
    )
    schema = _schema_at(spark, path, 0)
    r = VersionedTableStreamReader(path, schema, -1)
    r.partitions(r.initialOffset(), r.latestOffset())  # consume v0

    collect_blooms(spark, path, ["id"])
    for f in glob.glob(os.path.join(path, "_blooms", "*", "*.parquet")):
        os.remove(f)
    rep = fsck_repair_table(spark, path)
    assert rep["missing"] == [] and rep["version"] is not None
    m = _read_manifest(spark, path, rep["version"])
    assert m["op"] == "fsck" and m.get("fsck_removed") == []

    # live stream sails past the sidecar-only repair and reads the
    # next append — unpaced, paced, and CDF modes alike
    append_table(spark.createDataFrame([(9,)], "id long").coalesce(1), path)
    parts = r.partitions({"version": 1}, r.latestOffset())
    assert parts and all("/data/v3-" in p.path for p in parts)

    r2 = VersionedTableStreamReader(path, schema, 1, max_files=1)
    end = r2.latestOffset()
    assert r2.partitions(r2.initialOffset(), end)

    cdf_schema = schema.add("_change_type", "string").add(
        "_commit_version", "long"
    )
    r3 = VersionedTableStreamReader(path, cdf_schema, 1, cdf=True)
    assert r3.partitions(r3.initialOffset(), r3.latestOffset())

    # a DATA-file loss still refuses loudly
    data = sorted(glob.glob(os.path.join(path, "data", "v*", "*.parquet")))
    os.remove(data[0])
    rep2 = fsck_repair_table(spark, path)
    assert rep2["missing"] and rep2["version"] is not None
    r4 = VersionedTableStreamReader(path, schema, 1)
    with pytest.raises(RuntimeError, match="FSCK repair"):
        r4.partitions(r4.initialOffset(), {"version": rep2["version"]})
