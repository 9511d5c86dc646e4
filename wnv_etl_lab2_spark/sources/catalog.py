"""Table catalog over the driver-provided Parquet test data.

The reference binds its single source from a YAML config and reads CSV
row-at-a-time (SURVEY.md O1/O2; reference `config_loader.py:4-7`,
`Lab2ETL.py:67`). Here the catalog is a thin declarative layer: every
table is a columnar Parquet scan, so Catalyst gets predicate pushdown,
column pruning and partition pruning for free. At 100 TB these would be
partitioned/bucketed managed tables; the access pattern (named table ->
DataFrame, lazily read) is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Lazy Parquet scan for one catalog table."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    # The driver may hand us its own session (bypassing our factory):
    # pin the confs correctness depends on. UTC matches DuckDB's
    # naive-UTC timestamps; both are runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is Parquet TIMESTAMP(NANOS) — no Spark type exists
        # for it, so read nanos-as-long and convert (values are
        # microsecond-aligned; DuckDB's ns->us conversion is identical).
        # Set here (not only in our session factory) because the driver
        # may hand us its own session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so `spark.sql` works over the
    same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
