"""functions/timeutil.py: the epoch helpers must accept every
timestamp flavor the testdata (or a future regeneration of it) can
produce — TIMESTAMP_NTZ, TIMESTAMP, DATE — and agree with Python's
own UTC epoch arithmetic. Round 3 regression class: the driver's
parquet switched to tz-naive us timestamps (read as TIMESTAMP_NTZ)
and every unix_micros()/double-cast crashed at analysis time."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions.timeutil import epoch_days, epoch_seconds, epoch_us

WALL = dt.datetime(2024, 3, 5, 17, 30, 12, 345678)
WANT_US = int(WALL.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _one(spark, col_type: str):
    df = spark.createDataFrame([(WALL,)], f"t {col_type}")
    return df.select(
        epoch_us(F.col("t")).alias("us"),
        epoch_seconds(F.col("t")).alias("sec"),
        epoch_days(F.col("t")).alias("days"),
    ).collect()[0]


def test_epoch_helpers_on_timestamp_ntz(spark):
    r = _one(spark, "timestamp_ntz")
    assert r.us == WANT_US
    assert r.sec == WANT_US / 1_000_000.0
    assert r.days == WANT_US // 86_400_000_000


def test_epoch_helpers_on_timestamp_ltz(spark):
    """TIMESTAMP input: the cast to NTZ is identity-valued because the
    session is pinned UTC (sources/catalog.py) — same numbers."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    r = _one(spark, "timestamp")
    assert r.us == WANT_US


def test_epoch_helpers_on_date(spark):
    df = spark.createDataFrame([(dt.date(2024, 3, 5),)], "t date")
    r = df.select(epoch_days(F.col("t")).alias("d")).collect()[0]
    assert r.d == (dt.date(2024, 3, 5) - dt.date(1970, 1, 1)).days


def test_catalog_tables_all_load_and_project(spark, sf_dir):
    """Every catalog table loads and its full schema projects — the
    cheapest canary for a driver-side testdata format change (the
    round-3 breakage would have been caught here, not in the driver's
    correctness run)."""
    from wnv_etl_lab2_spark.sources.catalog import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, t, sf_dir)
        assert df.limit(1).count() == 1, f"{t} is empty or unreadable"
        # epoch math must work on every temporal column
        for f_ in df.schema.fields:
            if f_.dataType.typeName() in ("timestamp", "timestamp_ntz", "date"):
                df.select(epoch_us(F.col(f_.name))).limit(1).collect()
