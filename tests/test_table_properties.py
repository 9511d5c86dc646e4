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
