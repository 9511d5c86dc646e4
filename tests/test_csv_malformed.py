"""Malformed-CSV policies on csv_source: the remote-sheet feed the
reference ingests can hand back garbled lines, and each Spark mode
must behave as documented — PERMISSIVE audits, DROPMALFORMED drops,
FAILFAST refuses the load."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.pipeline import csv_source

_GOOD = ["addr,x,y", "12 Main St,-105.1,40.0", "9 Elm Ave,-105.2,40.1"]
_BAD = 'broken row with no commas at all and "an open quote'


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("csv") / "feed.csv"
    p.write_text("\n".join(_GOOD[:2] + [_BAD] + _GOOD[2:]) + "\n")
    return str(p)


_SCHEMA = "addr string, x double, y double, _corrupt_record string"


def test_permissive_captures_corrupt_record(spark, csv_path):
    df = csv_source(csv_path, schema=_SCHEMA)(spark).cache()
    rows = df.collect()
    assert len(rows) == 3
    bad = df.where(F.col("_corrupt_record").isNotNull()).collect()
    assert len(bad) == 1
    assert bad[0]["x"] is None  # bad fields nulled, raw line kept
    assert "open quote" in bad[0]["_corrupt_record"]
    good = df.where(F.col("_corrupt_record").isNull())
    assert good.count() == 2


def test_dropmalformed_drops_bad_rows(spark, csv_path):
    df = csv_source(csv_path, schema="addr string, x double, y double",
                    mode="DROPMALFORMED")(spark)
    assert [r["addr"] for r in df.orderBy("addr").collect()] == [
        "12 Main St",
        "9 Elm Ave",
    ]


def test_failfast_raises_on_first_bad_row(spark, csv_path):
    df = csv_source(csv_path, schema="addr string, x double, y double",
                    mode="FAILFAST")(spark)
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()
