"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over wnv_etl_lab2_spark.queries: ``entry`` runs the flagship
spray-targets slice (SURVEY.md §7) on sf0.001; ``queries`` /
``oracle_sql`` expose the full registry (one entry per implemented
operator from SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wnv_etl_lab2_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.queries()["spray_targets"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    approximate/UDF-backed queries are omitted (rows-only check)."""
    return q.oracle_sql()
