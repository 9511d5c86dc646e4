"""Timezone-safe timestamp arithmetic.

The testdata parquet stores tz-naive ``timestamp[us]`` values
(isAdjustedToUTC=false), which Spark 4 reads as TIMESTAMP_NTZ by default
(``spark.sql.parquet.inferTimestampNTZ.enabled``).  ``unix_micros`` /
``cast(... as double)`` only accept the tz-adjusted TIMESTAMP type, so every
epoch extraction in the repo goes through :func:`epoch_us`, which is exact
integer arithmetic on the NTZ wall-clock value and involves no session
timezone at all for NTZ input.  (For legacy TIMESTAMP input the initial cast
to NTZ is identity-valued under the catalog's pinned UTC session —
``sources/catalog.py`` sets ``spark.sql.session.timeZone=UTC``.)

DuckDB's ``epoch_us(ts)`` / ``epoch(ts)`` on naive timestamps use the same
"wall clock is UTC" convention, so oracle SQL and these helpers agree
bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F

_EPOCH_NTZ = "1970-01-01 00:00:00"


def epoch_us(c: Column) -> Column:
    """Epoch microseconds (BIGINT) of a TIMESTAMP or TIMESTAMP_NTZ column."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit(_EPOCH_NTZ).cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def epoch_seconds(c: Column) -> Column:
    """Epoch seconds as DOUBLE (microsecond-fraction preserved) — the value
    DuckDB's ``epoch(ts)`` returns for naive timestamps."""
    return epoch_us(c) / F.lit(1000000.0)


def epoch_days(c: Column) -> Column:
    """Whole days since the epoch (BIGINT); exact for post-1970 data."""
    return F.floor(epoch_us(c) / F.lit(86400000000)).cast("long")
