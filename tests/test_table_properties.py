"""Table properties (TBLPROPERTIES): versioned key-value metadata.

Pins the round-13 contract: SET/UNSET are metadata-only commits, the
map is carried by every write verb (versioned, time-travelable), the
SQL surface round-trips it, DESCRIBE DETAIL surfaces it, and bare
VACUUM honors the ``retention.hours`` property.
"""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.sources.delta_sql import DeltaSql
from wnv_etl_lab2_spark.sources.versioned import (
    append_table,
    create_table,
    delete_from_table,
    latest_version,
    set_table_properties,
    table_properties,
    unset_table_properties,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(spark.createDataFrame([(1, "a")], "id long, v string"), path)
    return path


def test_set_get_unset_roundtrip(spark, table):
    v = set_table_properties(spark, table, {"owner": "data-eng", "tier": "gold"})
    assert v == 1
    assert table_properties(spark, table) == {"owner": "data-eng", "tier": "gold"}
    set_table_properties(spark, table, {"tier": "silver"})  # overwrite merges
    assert table_properties(spark, table)["tier"] == "silver"
    assert table_properties(spark, table)["owner"] == "data-eng"
    unset_table_properties(spark, table, ["owner"])
    assert table_properties(spark, table) == {"tier": "silver"}
    with pytest.raises(ValueError, match="not set"):
        unset_table_properties(spark, table, ["ghost"])


def test_properties_survive_dml_and_time_travel(spark, table):
    set_table_properties(spark, table, {"owner": "x"})
    append_table(spark.createDataFrame([(2, "b")], "id long, v string"), table)
    delete_from_table(spark, table, "id = 1")
    assert table_properties(spark, table) == {"owner": "x"}
    # version 0 predates the property: time travel shows none
    assert table_properties(spark, table, version=0) == {}


def test_sql_surface_and_describe_detail(spark, table):
    sql = DeltaSql(spark, {"t": table})
    sql.run("ALTER TABLE t SET TBLPROPERTIES ('owner' = 'sql', 'pii' = 'false')")
    shown = {(r.key, r.value) for r in sql.run("SHOW TBLPROPERTIES t").collect()}
    assert shown == {("owner", "sql"), ("pii", "false")}
    detail = sql.run("DESCRIBE DETAIL t").collect()[0]
    assert detail["properties"]["owner"] == "sql"
    sql.run("ALTER TABLE t UNSET TBLPROPERTIES ('pii')")
    assert table_properties(spark, table) == {"owner": "sql"}


def test_bare_vacuum_honors_retention_property(spark, table):
    sql = DeltaSql(spark, {"t": table})
    append_table(spark.createDataFrame([(2, "b")], "id long, v string"), table)
    append_table(spark.createDataFrame([(3, "c")], "id long, v string"), table)
    # default: 7-day retention -> young history survives a bare VACUUM
    assert sql.run("VACUUM t") == []
    assert latest_version(spark, table) == 2
    # retention.hours = 0: bare VACUUM may drop everything but the tip
    set_table_properties(spark, table, {"retention.hours": "0"})
    dropped = sql.run("VACUUM t")
    assert dropped  # old versions actually went
    from wnv_etl_lab2_spark.sources.versioned import read_table

    assert read_table(spark, table).count() == 3  # tip intact


def test_create_table_with_column_defs(spark, tmp_path):
    """Round 13: the explicit-schema CREATE TABLE form declares NOT
    NULL, GENERATED, IDENTITY, PARTITIONED BY and TBLPROPERTIES in one
    statement; subsequent writes honor every declaration."""
    from wnv_etl_lab2_spark.sources.versioned import (
        read_table,
        table_constraints,
        table_schema,
    )

    path = str(tmp_path / "ddl")
    sql = DeltaSql(spark, {"t": path})
    sql.run(
        "CREATE TABLE t ("
        "  rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5),"
        "  name STRING NOT NULL,"
        "  amount BIGINT,"
        "  total BIGINT GENERATED ALWAYS AS (amount * 2),"
        "  lang STRING"
        ") PARTITIONED BY (lang) TBLPROPERTIES ('owner' = 'ddl')"
    )
    assert read_table(spark, path).count() == 0
    assert set(table_schema(spark, path).names) == {
        "rid", "name", "amount", "total", "lang"
    }
    assert not table_schema(spark, path)["name"].nullable
    cons = table_constraints(spark, path)
    assert cons["nn_name"] == "name IS NOT NULL"
    assert cons["gen_total"] == "total <=> (amount * 2)"
    assert table_properties(spark, path) == {"owner": "ddl"}

    # first write into the empty partitioned table: identity allocates
    # (start 10, step 5), generated computes, hive layout applies
    from wnv_etl_lab2_spark.sources.versioned import append_table

    append_table(
        spark.createDataFrame(
            [("a", 3, "de"), ("b", 4, "fr")],
            "name string, amount long, lang string",
        ),
        path,
    )
    rows = {
        (r.rid, r.name, r.amount, r.total, r.lang)
        for r in read_table(spark, path).collect()
    }
    assert {(n, a, t, lg) for _, n, a, t, lg in rows} == {
        ("a", 3, 6, "de"), ("b", 4, 8, "fr")
    }
    assert {r[0] for r in rows} == {10, 15}
    assert read_table(spark, path, partition_filter={"lang": "de"}).count() == 1


def test_create_table_ddl_writes_enforce_declarations(spark, tmp_path):
    from wnv_etl_lab2_spark.sources.versioned import append_table, read_table

    path = str(tmp_path / "ddl2")
    sql = DeltaSql(spark, {"t": path})
    sql.run(
        "CREATE TABLE t ("
        "  rid BIGINT GENERATED ALWAYS AS IDENTITY,"
        "  name STRING NOT NULL,"
        "  amount BIGINT,"
        "  total BIGINT GENERATED ALWAYS AS (amount * 2)"
        ")"
    )
    append_table(
        spark.createDataFrame([("a", 4), ("b", 5)], "name string, amount long"),
        path,
    )
    rows = {
        (r.name, r.amount, r.total) for r in read_table(spark, path).collect()
    }
    assert rows == {("a", 4, 8), ("b", 5, 10)}
    ids = [r.rid for r in read_table(spark, path).collect()]
    assert sorted(ids) == [1, 2]  # identity allocated from start 1
    with pytest.raises(ValueError, match="nn_name"):
        append_table(
            spark.createDataFrame([(None, 1)], "name string, amount long"), path
        )
