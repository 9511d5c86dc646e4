"""Upsert / SCD2 without a table format (SURVEY.md §2.2 CDC shape).

The environment has no Delta/Iceberg jars, so MERGE INTO is emulated
with the classic relational decomposition — which is also exactly what
those formats do under the hood:

- merge_upsert: target rows not touched by updates (anti-join) UNION
  the updates (last-writer-wins per key via a ranked window).
- scd2_apply: slowly-changing-dimension type 2 — closing the current
  version of changed keys and appending the new open version, with
  [valid_from, valid_to) intervals.

Both are one shuffle on the key; at 100 TB the rewrite is bounded to
changed partitions by partition pruning on the key's partition column
(out of scope for the synthetic tables here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

END_OF_TIME = "9999-12-31 00:00:00"


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    order_col: str | None = None,
) -> DataFrame:
    """UPSERT: update rows win over target rows; duplicate update keys
    resolve to the latest by ``order_col`` (deterministic tie-break on
    the key itself when order_col ties)."""
    if order_col:
        # tie-break must NOT be the partition key (constant within the
        # window): break order_col ties on a hash of the remaining
        # columns, which is deterministic for any distinct rows and
        # indifferent for fully-identical ones.
        tie_cols = [c for c in updates.columns if c not in (key, order_col)]
        tie = F.xxhash64(*[F.col(c) for c in tie_cols]) if tie_cols else F.lit(0)
        w = W.partitionBy(key).orderBy(F.col(order_col).desc(), tie.asc())
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates.select(*kept.columns))


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts: str = "change_ts",
    tracked_cols: tuple[str, ...] = (),
) -> DataFrame:
    """SCD2: ``dim`` has [key, tracked..., valid_from, valid_to,
    is_current]; ``changes`` has [key, tracked..., change_ts].

    Closed versions pass through; the current version of a changed key
    closes at that key's EARLIEST change; multiple changes per key
    chain into consecutive [change_i, change_i+1) versions with only
    the latest left current. Exact-duplicate (key, change_ts) rows are
    collapsed first (the batch has no defined order between them).
    Unchanged keys pass through untouched.

    STALE changes — change_ts at or before the current version's
    valid_from — are REJECTED (dropped), not applied: closing the open
    version at an earlier timestamp would mint a negative-length
    [valid_from, valid_to) row overlapping already-closed history.
    Rewriting closed history from late data is a different operation
    (a full rebuild from the event log), not an incremental apply.
    """
    tracked = list(tracked_cols)
    ch = changes.select(key, *tracked, F.col(change_ts).alias("_new_from")).dropDuplicates(
        [key, "_new_from"]
    )
    cur_from = dim.where(F.col("is_current")).select(
        key, F.col("valid_from").alias("_cur_from")
    )
    ch = (
        ch.join(cur_from, key, "left")
        .where(F.col("_cur_from").isNull() | (F.col("_new_from") > F.col("_cur_from")))
        .drop("_cur_from")
    )
    # chain versions per key: valid_to = next change (or open-ended)
    wseq = W.partitionBy(key).orderBy(F.col("_new_from").asc())
    ch = ch.withColumn("_next_from", F.lead("_new_from").over(wseq))

    current = dim.where(F.col("is_current"))
    closed = dim.where(~F.col("is_current"))

    first_change = ch.groupBy(key).agg(F.min("_new_from").alias("_first_from"))
    touched = current.join(first_change, key, "inner")
    untouched = current.join(ch.select(key), key, "left_anti")

    closed_now = touched.select(
        key,
        *[F.col(c) for c in tracked],
        F.col("valid_from"),
        F.col("_first_from").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # END_OF_TIME takes the change column's OWN type: the testdata's
    # event-time columns are TIMESTAMP_NTZ (see functions/timeutil),
    # and a hard cast to "timestamp" (LTZ) would make the coalesce
    # branches type-mismatch for NTZ inputs.
    end_lit = F.lit(END_OF_TIME).cast(ch.schema["_new_from"].dataType)
    opened = ch.select(
        key,
        *[F.col(c) for c in tracked],
        F.col("_new_from").alias("valid_from"),
        F.coalesce(F.col("_next_from"), end_lit).alias("valid_to"),
        F.col("_next_from").isNull().alias("is_current"),
    )
    cols = [key, *tracked, "valid_from", "valid_to", "is_current"]
    return (
        closed.select(*cols)
        .unionByName(untouched.select(*cols))
        .unionByName(closed_now.select(*cols))
        .unionByName(opened.select(*cols))
    )
