"""Skew-mitigation: salted two-phase aggregation.

At 100 TB a groupBy whose key distribution is Zipfian puts one
reducer under a hot key. AQE's skew-join handling covers joins; for
aggregations the classic fix is salting: partial-aggregate on
(key, salt), then final-aggregate on key. Both phases are algebraic
(sum/count/min/max commute with the split), so the result is
IDENTICAL to the unsalted groupBy — which is exactly what the
`salted_groupby` query's oracle asserts.

Salt must be deterministic (no rand(): results must be reproducible
and retries idempotent), so it hashes a caller-named high-cardinality
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name -> (agg_fn, input_col) with agg_fn in
    {sum, count, min, max}. ``salt_col`` is any high-cardinality
    column; the salt is pmod(xxhash64(salt_col), buckets).
    """
    bad = {fn for fn, _ in aggs.values()} - set(_ALGEBRAIC)
    if bad:
        raise ValueError(f"non-algebraic agg fns not supported: {sorted(bad)}")
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_ALGEBRAIC[fn](col).alias(f"_p_{name}") for name, (fn, col) in aggs.items()]
    )
    final = partial.groupBy(*keys).agg(
        *[_MERGE[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )
    return final


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-mitigated equi-join: the big side gets a salt derived from
    a high-cardinality column, the small side is replicated once per
    salt bucket, and the join keys on (key, salt). A hot join key is
    thereby spread over ``buckets`` shuffle partitions instead of one.
    Row-for-row IDENTICAL to the plain inner join (each big row meets
    each matching small row exactly once — in the one bucket its salt
    selects), which the `salted_join_agg` query's oracle asserts.

    Cost: the SMALL side shuffles buckets-times larger — use only when
    a key is hot enough to dominate a stage; AQE's skew-join split is
    the first resort, salting the explicit fallback (it also works on
    broadcast-ineligible mid-size dims where AQE can't split)."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source_col)), F.lit(buckets))
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return salted_big.join(replicated, [key, "_salt"]).drop("_salt")
