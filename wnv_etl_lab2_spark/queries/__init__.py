"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus, where
SQL-expressible, an ANSI-SQL oracle string DuckDB runs over the same
Parquet tables. The driver hashes both results (column-name-sorted,
order-insensitive), so every computed column is aliased identically on
both sides, and any arithmetic that must match bit-for-bit is written
as a *shared SQL fragment* evaluated by ``F.expr`` in Spark and pasted
verbatim into the oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # populate REGISTRY (import order fixes registry order)
    from wnv_etl_lab2_spark.queries import (  # noqa: F401
        advanced_q,
        relational,
        joins_windows,
        spatial_q,
        sql_api_q,
        temporal_q,
        text_q,
        similarity_q,
        multimodal_q,
    )

    _LOADED = True
