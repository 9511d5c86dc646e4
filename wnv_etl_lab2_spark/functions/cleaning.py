"""Row-cleaning scalar functions (reference parity, Spark-native).

The reference cleans each coordinate string row-at-a-time in Python —
strip whitespace, strip quotes, float(), drop the row on ValueError
(reference `Lab2ETL.py:76-80`, `final_project2.py:114-119`) — and
appends constant / derived string columns one row at a time
(`Lab2ETL.py:69,78`). Here each becomes a single JVM-side Catalyst
expression: whole-stage-codegen'd, vectorized over Parquet batches,
and pushdown-friendly. No Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_cast_double(col: Column | str) -> Column:
    """Strip quotes + whitespace, then cast to double.

    Mirrors the reference's `float(str(x).strip().replace("'", ...))`
    with drop-on-ValueError semantics: a failed cast yields NULL, which
    the caller filters — identical row-level skip behavior, but
    expressed declaratively so Catalyst can pipeline it into the scan.
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast, not cast: under ANSI mode (Spark 4 default) a plain
    # cast aborts the job on 'n/a'; try_cast yields NULL = drop-row.
    return F.trim(F.regexp_replace(c.cast("string"), "['\"]", "")).try_cast("double")


def with_full_address(col: Column | str, suffix: str = " Boulder CO") -> Column:
    """Projection + string-concat derived column (reference
    `Lab2ETL.py:69`): address + literal region suffix."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(c, F.lit(suffix))


def with_constant(value: str) -> Column:
    """Constant-column append (reference `Lab2ETL.py:78`,
    `Type = "Residential"`)."""
    return F.lit(value)
