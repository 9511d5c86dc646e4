"""Pipeline protocol + enrichment operators: the reference's ETL shape
(extract -> transform -> load, `GSheetsETL_Lab2.py:137-151`) as one
lazy Spark plan, plus the geocode-enrichment paths (O4/O5)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions.cleaning import clean_cast_double, with_constant, with_full_address
from wnv_etl_lab2_spark.operators.enrichment import lookup_join_enrich, rate_limited_enrich
from wnv_etl_lab2_spark.pipeline import Pipeline, csv_sink, csv_source, parquet_source


def test_reference_etl_pipeline_end_to_end(spark, tmp_path):
    """The reference's full transform, one plan: raw addresses ->
    concat suffix (O3) -> lookup-join geocode (O4) -> null filter (O6)
    -> clean/cast (O7) -> constant Type column (O8) -> CSV sink (O9)
    -> read back and check golden rows."""
    raw = tmp_path / "raw.csv"
    raw.write_text(
        "Timestamp,Street Address,Zipcode\n"
        "4/24/2025 14:03:22,825 Walnut St,80302\n"
        "4/24/2025 14:04:00,1200 Pearl St,80302\n"
        "4/24/2025 14:05:00,9999 Nowhere Rd,80302\n"  # geocode miss -> dropped
        "4/24/2025 14:06:00,633 S Broadway,80305\n"  # bad lat 'n/a' -> dropped
    )
    lookup = spark.createDataFrame(
        [
            ("825 Walnut St Boulder CO", '"-105.279"', " 40.016 "),
            ("1200 Pearl St Boulder CO", "-105.277", "40.018"),
            ("633 S Broadway Boulder CO", "-105.251", "n/a"),
        ],
        "query_addr string, lon string, lat string",
    )

    def transform(df):
        df = df.withColumn("full_addr", with_full_address(F.col("Street Address")))
        df = lookup_join_enrich(df, lookup, "full_addr", "query_addr")
        df = df.select(
            clean_cast_double("lon").alias("x"),
            clean_cast_double("lat").alias("y"),
        )
        df = df.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        return df.withColumn("Type", with_constant("Residential"))

    out = str(tmp_path / "points_csv")
    pipe = Pipeline(csv_source(str(raw)), [transform], name="wnv_etl")
    pipe.run(spark, csv_sink(out))

    back = spark.read.option("header", True).csv(out)
    rows = {(float(r.x), float(r.y), r.Type) for r in back.collect()}
    assert rows == {(-105.279, 40.016, "Residential"), (-105.277, 40.018, "Residential")}


def test_pipeline_then_composes(spark, sf_dir):
    p = Pipeline(parquet_source(f"{sf_dir}/orders.parquet"), name="orders")
    p2 = p.then(lambda df: df.where(F.col("o_totalprice") > 100000)).then(
        lambda df: df.select("o_orderkey")
    )
    df = p2.build(spark)
    assert df.columns == ["o_orderkey"]
    assert p2.name == "orders" and len(p2.transforms) == 2
    assert not p.transforms  # immutability: .then returns a new pipeline


def test_partitioned_write_prunes_at_read(spark, sf_dir, tmp_path):
    """Date-partitioned parquet sink + partition pruning on read — the
    lever that turns a 100 TB scan into a one-day scan."""
    from wnv_etl_lab2_spark.pipeline import parquet_sink
    from wnv_etl_lab2_spark.sources.catalog import load_table

    ev = load_table(spark, "events", sf_dir).withColumn("dt", F.to_date("ts"))
    out = str(tmp_path / "events_by_day")
    parquet_sink(out, partition_by=("dt",))(ev)

    back = spark.read.parquet(out).where(F.col("dt") == "2024-01-02")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan
    n = back.count()
    truth = ev.where(F.col("dt") == "2024-01-02").count()
    assert n == truth > 0


def test_rate_limited_enrich_throttles_and_maps(spark):
    df = spark.createDataFrame([(f"addr{i}",) for i in range(4)], "full_addr string")

    def fake_geocode(addr: str):
        if addr == "addr2":
            return (None, None)  # the reference's geocode-miss path
        return (float(len(addr)), 1.0)

    t0 = time.monotonic()
    out = rate_limited_enrich(
        df.coalesce(1), fake_geocode, "full_addr", rate_per_sec=10.0
    ).collect()
    elapsed = time.monotonic() - t0
    got = {r.full_addr: (r.x, r.y) for r in out}
    assert got["addr0"] == (5.0, 1.0)
    assert got["addr2"] == (None, None)
    # 4 calls at 10/s from one token bucket >= ~0.3s
    assert elapsed >= 0.25


def test_curation_pipeline_matches_yield_sheet(spark, sf_dir, tmp_path):
    """The executable curation pipeline (curation.py) must write
    exactly the documents the corpus_curation_stats yield sheet counts
    as kept — per source, not just in total."""
    from wnv_etl_lab2_spark.curation import curation_pipeline
    from wnv_etl_lab2_spark.pipeline import parquet_sink
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

    out = str(tmp_path / "curated")
    curation_pipeline(sf_dir).run(spark, parquet_sink(out))
    got = (
        spark.read.parquet(out)
        .groupBy("source")
        .count()
        .toPandas()
        .set_index("source")["count"]
        .to_dict()
    )

    _ensure_loaded()
    sheet = REGISTRY["corpus_curation_stats"].fn(spark, sf_dir).toPandas()
    want = {r.source: int(r.kept_docs) for r in sheet.itertuples() if r.kept_docs}
    assert got == want


def test_observed_metrics_ride_the_sink_job(spark, sf_dir, tmp_path):
    """run(metrics=...) returns accumulator-style metrics computed
    INSIDE the single sink action (df.observe) — row counts and
    quality tallies with no second job over the plan. Values must
    equal an independent recount."""
    from pyspark.sql import functions as F

    from wnv_etl_lab2_spark.pipeline import Pipeline, parquet_sink
    from wnv_etl_lab2_spark.sources.catalog import load_table

    src = lambda s: load_table(s, "documents", sf_dir)  # noqa: E731
    keep_short = lambda df: df.where(F.col("n_chars") < 400)  # noqa: E731
    p = Pipeline(src, [keep_short], name="obs_demo")
    out = str(tmp_path / "obs_out")
    got = p.run(
        spark,
        parquet_sink(out),
        metrics={
            "n_rows": F.count(F.lit(1)),
            "n_en": F.count(F.when(F.col("lang") == "en", 1)),
            "total_chars": F.sum("n_chars"),
        },
    )
    check = (
        load_table(spark, "documents", sf_dir)
        .where(F.col("n_chars") < 400)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("lang") == "en", 1)).alias("n_en"),
            F.sum("n_chars").alias("total_chars"),
        )
        .collect()[0]
    )
    assert got["n_rows"] == check["n_rows"] > 0
    assert got["n_en"] == check["n_en"]
    assert got["total_chars"] == check["total_chars"]
    # the sink actually wrote the same rows the metrics describe
    assert spark.read.parquet(out).count() == got["n_rows"]


def test_run_without_metrics_returns_none(spark, sf_dir, tmp_path):
    from wnv_etl_lab2_spark.pipeline import Pipeline, parquet_sink
    from wnv_etl_lab2_spark.sources.catalog import load_table

    p = Pipeline(lambda s: load_table(s, "region", sf_dir), name="plain")
    assert p.run(spark, parquet_sink(str(tmp_path / "r"))) is None
