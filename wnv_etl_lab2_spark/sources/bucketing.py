"""Bucketed managed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides. Bucketing pre-partitions (and pre-sorts) the stored table on
the join key, so a later join on that key needs NO exchange at all —
both sides are already co-located by bucket. This module is the write
path + the repartition-based in-flight equivalent; the plan-level
proof (no Exchange under the SortMergeJoin) is in
tests/test_bucketing.py.

The reference has no storage layout concept (files between stages,
SURVEY.md §3); this is pure scale extension.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed Parquet table.

    Idempotent (the reference's overwrite model, O9): drops the
    catalog entry AND any orphaned location left by a dead session.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # managed-table locations are lowercased, and db-qualified names
    # live under <db>.db/<tbl> — mirror that or the orphan survives
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    parts = table.lower().split(".")
    rel = f"{parts[0]}.db/{parts[1]}" if len(parts) == 2 else parts[0]
    shutil.rmtree(f"{warehouse}/{rel}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: Catalyst sees the matching output partitioning and elides
    both exchanges (assert: no Exchange in the executed plan)."""
    return read_table(spark, left_table).join(read_table(spark, right_table), key, how)
