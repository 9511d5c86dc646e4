"""COPY INTO: Delta-style idempotent, incremental file ingest.

Pins the load-ledger contract (`sources/versioned.py copy_into`):
only never-loaded files load, re-runs are no-ops (no new version),
FORCE reloads, schema aligns by name with null backfill and declared-
type casts, the ledger rides the SAME atomic commit as the data, and
the SQL verb (`sources/delta_sql.py COPY INTO`) is lifecycle-equal.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.sources.delta_sql import DeltaSql
from wnv_etl_lab2_spark.sources.versioned import (
    copy_into,
    copy_into_ledger,
    create_table,
    latest_version,
    read_table,
)


def _content(df):
    return {tuple(r) for r in df.select(sorted(df.columns)).collect()}


@pytest.fixture()
def target(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(0, "seed", 1.0)], "id long, name string, score double"
    )
    assert create_table(base, path) == 0
    return path


def _land(spark, tmp_path, name: str, rows, schema) -> str:
    """One landing-zone parquet file at <tmp>/land/<name>/ (one file
    per directory keeps file identity deterministic for asserts)."""
    d = str(tmp_path / "land" / name)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    return d


def _landing_dir(tmp_path) -> str:
    return str(tmp_path / "landing")


def _drop_file(spark, tmp_path, rows, schema) -> None:
    """Append one parquet data file into the shared landing dir."""
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
        _landing_dir(tmp_path)
    )


def test_copy_into_loads_once_and_rerun_is_noop(spark, tmp_path, target):
    _drop_file(spark, tmp_path, [(1, "a", 2.0)], "id long, name string, score double")
    _drop_file(spark, tmp_path, [(2, "b", 3.0)], "id long, name string, score double")
    out = copy_into(spark, target, _landing_dir(tmp_path))
    assert out["files_loaded"] == 2 and out["rows_loaded"] == 2
    assert out["version"] == 1
    assert _content(read_table(spark, target)) == {
        (0, "seed", 1.0),
        (1, "a", 2.0),
        (2, "b", 3.0),
    }
    # identical re-run: nothing loads, NO new version commits
    again = copy_into(spark, target, _landing_dir(tmp_path))
    assert again == {
        "version": None,
        "files_loaded": 0,
        "rows_loaded": 0,
        "files_skipped": 2,
    }
    assert latest_version(spark, target) == 1


def test_copy_into_is_incremental_across_new_files(spark, tmp_path, target):
    _drop_file(spark, tmp_path, [(1, "a", 2.0)], "id long, name string, score double")
    assert copy_into(spark, target, _landing_dir(tmp_path))["rows_loaded"] == 1
    _drop_file(spark, tmp_path, [(2, "b", 3.0)], "id long, name string, score double")
    out = copy_into(spark, target, _landing_dir(tmp_path))
    # only the NEW file loads; the old one is ledger-skipped
    assert out["files_loaded"] == 1 and out["files_skipped"] == 1
    assert out["rows_loaded"] == 1
    assert read_table(spark, target).count() == 3
    # the ledger now remembers both files
    assert len(copy_into_ledger(spark, target)) == 2


def test_copy_into_force_reloads(spark, tmp_path, target):
    _drop_file(spark, tmp_path, [(1, "a", 2.0)], "id long, name string, score double")
    copy_into(spark, target, _landing_dir(tmp_path))
    out = copy_into(spark, target, _landing_dir(tmp_path), force=True)
    assert out["files_loaded"] == 1 and out["files_skipped"] == 0
    # forced duplicate row is really appended (COPY_OPTIONS force)
    assert read_table(spark, target).where(F.col("id") == 1).count() == 2


def test_copy_into_aligns_schema_by_name(spark, tmp_path, target):
    # source file: different column ORDER, int score (narrower type),
    # and NO name column -> reordered, cast to double, null-backfilled
    d = _land(spark, tmp_path, "partial", [(7, 9)], "score int, id long")
    out = copy_into(spark, target, d)
    assert out["rows_loaded"] == 1
    row = read_table(spark, target).where(F.col("id") == 9).collect()[0]
    assert row["score"] == 7.0 and row["name"] is None


def test_copy_into_rejects_unknown_source_columns(spark, tmp_path, target):
    d = _land(
        spark, tmp_path, "extra",
        [(1, "x", 1.0, "oops")],
        "id long, name string, score double, extra string",
    )
    with pytest.raises(ValueError, match="absent from the target"):
        copy_into(spark, target, d)
    # failed COPY committed nothing
    assert latest_version(spark, target) == 0
    assert copy_into_ledger(spark, target) == {}


def test_copy_into_pattern_filters_files(spark, tmp_path, target):
    _drop_file(spark, tmp_path, [(1, "a", 2.0)], "id long, name string, score double")
    out = copy_into(spark, target, _landing_dir(tmp_path), pattern="*.txt")
    assert out == {
        "version": None,
        "files_loaded": 0,
        "rows_loaded": 0,
        "files_skipped": 0,
    }
    assert copy_into(
        spark, target, _landing_dir(tmp_path), pattern="*.parquet"
    )["files_loaded"] == 1


def test_copy_into_csv_with_format_options(spark, tmp_path, target):
    d = tmp_path / "csvland"
    d.mkdir()
    (d / "batch1.csv").write_text("id,name,score\n5,csv,4.5\n")
    out = copy_into(
        spark, target, str(d), file_format="csv",
        format_options={"header": "true", "inferSchema": "true"},
    )
    assert out["rows_loaded"] == 1
    assert (5, "csv", 4.5) in _content(read_table(spark, target))


def test_copy_into_ledger_survives_other_dml(spark, tmp_path, target):
    from wnv_etl_lab2_spark.sources.versioned import delete_from_table

    _drop_file(spark, tmp_path, [(1, "a", 2.0)], "id long, name string, score double")
    copy_into(spark, target, _landing_dir(tmp_path))
    delete_from_table(spark, target, "id = 0")  # unrelated commit on top
    again = copy_into(spark, target, _landing_dir(tmp_path))
    assert again["files_loaded"] == 0 and again["files_skipped"] == 1


def test_copy_into_sql_verb_lifecycle(spark, tmp_path, target):
    _drop_file(spark, tmp_path, [(1, "a", 2.0)], "id long, name string, score double")
    sql = DeltaSql(spark, {"t": target})
    out = sql.run(
        f"COPY INTO t FROM '{_landing_dir(tmp_path)}' FILEFORMAT = PARQUET "
        "PATTERN = '*.parquet'"
    )
    assert out["files_loaded"] == 1
    assert sql.run(
        f"COPY INTO t FROM '{_landing_dir(tmp_path)}' FILEFORMAT = PARQUET"
    )["files_loaded"] == 0
    forced = sql.run(
        f"COPY INTO t FROM '{_landing_dir(tmp_path)}' FILEFORMAT = PARQUET "
        "COPY_OPTIONS ('force' = 'true')"
    )
    assert forced["files_loaded"] == 1


def test_copy_into_sql_csv_format_options(spark, tmp_path, target):
    d = tmp_path / "csvland"
    d.mkdir()
    (d / "b.csv").write_text("id,name,score\n6,viasql,7.5\n")
    sql = DeltaSql(spark, {"t": target})
    out = sql.run(
        f"COPY INTO t FROM '{d}' FILEFORMAT = CSV "
        "FORMAT_OPTIONS ('header' = 'true', 'inferSchema' = 'true')"
    )
    assert out["rows_loaded"] == 1
    assert (6, "viasql", 7.5) in _content(read_table(spark, target))


def test_copy_into_partitioned_target_keeps_layout(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(0, "de", 1.0)], "id long, lang string, score double"
    )
    create_table(base, path, partition_by=("lang",))
    d = _land(
        spark, tmp_path, "p1",
        [(1, "fr", 2.0), (2, "de", 3.0)],
        "id long, lang string, score double",
    )
    assert copy_into(spark, path, d)["rows_loaded"] == 2
    only_fr = read_table(spark, path, partition_filter={"lang": "fr"})
    assert _content(only_fr) == {(1, "fr", 2.0)}
    assert read_table(spark, path).count() == 3
