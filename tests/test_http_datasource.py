"""Spark 4 Python DataSource connector (sources/http_datasource.py):
executor-parallel HTTP CSV reads driven end-to-end with the recorded
replay opener — no sockets."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.sources.http import replay_opener
from wnv_etl_lab2_spark.sources.http_datasource import HttpCsvDataSource

CSV_A = b"x,y,type\n1.5,2.5,Residential\n3.0,4.0,Residential\n"
CSV_B = b"x,y,type\n5.0,6.0,Commercial\n"

RESPONSES = {
    "https://sheets.example/a.csv": (
        307,
        {"Location": "https://cdn.example/a.csv"},
        b"",
    ),
    "https://cdn.example/a.csv": (200, {}, CSV_A),
    "https://sheets.example/b.csv": (200, {}, CSV_B),
    "https://sheets.example/bad.csv": (200, {}, b"wrong,header\n1,2\n"),
}


@pytest.fixture()
def registered(spark):
    # A locally-defined subclass is pickled BY VALUE (cloudpickle), so
    # the injected opener travels to the data-source workers; the
    # importable base class would be pickled by reference and resolve
    # to the default urllib opener there.
    class ReplayHttpCsv(HttpCsvDataSource):
        opener = staticmethod(replay_opener(RESPONSES))

    spark.dataSource.register(ReplayHttpCsv)
    return spark


def test_manifest_reads_all_urls_in_parallel_partitions(registered):
    df = (
        registered.read.format("http_csv")
        .schema("x double, y double, type string")
        .option(
            "urls",
            "https://sheets.example/a.csv,https://sheets.example/b.csv",
        )
        .load()
    )
    # one input partition per manifest URL — the fetches are
    # executor-side tasks, not a driver loop
    assert df.rdd.getNumPartitions() == 2
    rows = sorted((r.x, r.y, r.type) for r in df.collect())
    # includes a.csv's rows, reached through the recorded 307 redirect
    # (the reference's published-sheet flow)
    assert rows == sorted(
        [(1.5, 2.5, "Residential"), (3.0, 4.0, "Residential"), (5.0, 6.0, "Commercial")]
    )


def test_header_mismatch_fails_loudly(registered):
    df = (
        registered.read.format("http_csv")
        .schema("x double, y double, type string")
        .option("urls", "https://sheets.example/bad.csv")
        .load()
    )
    with pytest.raises(Exception, match="header mismatch"):
        df.collect()


def test_missing_urls_option_rejected(registered):
    df = (
        registered.read.format("http_csv")
        .schema("x double, y double, type string")
        .load()
    )
    with pytest.raises(Exception, match="urls"):
        df.collect()


def test_int_column_round_trips(registered):
    """`int` was silently string-mapped before the typed Arrow map —
    pin that the extended type mapping yields real int32 values."""
    class IntCsv(HttpCsvDataSource):
        opener = staticmethod(
            replay_opener({"https://sheets.example/i.csv": (200, {}, b"n,type\n7,Park\n")})
        )

    registered.dataSource.register(IntCsv)
    df = (
        registered.read.format("http_csv")
        .schema("n int, type string")
        .option("urls", "https://sheets.example/i.csv")
        .load()
    )
    assert df.schema["n"].dataType.simpleString() == "int"
    assert [(r.n, r.type) for r in df.collect()] == [(7, "Park")]


def test_unsupported_declared_type_rejected_at_plan_time(registered):
    """A declared Spark type outside the Arrow CSV map must raise a
    clear unsupported-type error, not silently decode as strings."""
    df = (
        registered.read.format("http_csv")
        .schema("x double, tags array<string>")
        .option("urls", "https://sheets.example/a.csv")
        .load()
    )
    with pytest.raises(Exception, match="cannot map declared field"):
        df.collect()
