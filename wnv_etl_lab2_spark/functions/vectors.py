"""Vector math over `array<float>` columns, JVM-side.

Used by the similarity-search and embedding-dedup operators. These are
built from `F.zip_with` / `F.aggregate` higher-order functions, which
run inside Catalyst (no Python, no Arrow transfer) — at 100 TB the dot
products happen inside whole-stage codegen next to the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column | str) -> Column:
    """L2 norm of an array<numeric> column."""
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe only insofar as inputs are non-null."""
    return dot_col(a, b) / (norm_col(a) * norm_col(b))
