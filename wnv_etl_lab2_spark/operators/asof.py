"""As-of (most-recent-match) and bucketed range joins.

Spark has no native ASOF JOIN (DuckDB/kdb/Pandas do). The classic
scalable re-expression — used here — is union + ordered window:

    left  (needs a match)   --tagged-->  union  --window per key-->
    right (provides values) --tagged-->         last(right value) over
                                                (ts asc, right-first)

One shuffle on the key, state is one row per partition frame — no
range explosion, no per-row search. `merge_asof`-style semantics:
match the latest right row with ts_r <= ts_l.

The range join buckets the time axis at the interval width so the
candidate join is an equi-join on (key, bucket) — same shape as the
spatial grid join in operators/spatial.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions.timeutil import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """For every left row, attach the value columns of the latest
    right row with the same ``by`` key and right_ts <= left_ts.

    Output: all left columns + matched_ts + matched_<value_col>...
    (NULLs when no right row precedes the left row).
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    # NULL keys must not match each other (ASOF equality semantics;
    # the window would otherwise group them into one partition).
    # _tie: deterministic order among right rows sharing (key, ts) —
    # without it F.last picks whichever duplicate the shuffle happened
    # to order last, and the match drifts across runs. The hash of the
    # value columns makes the pick stable (the duplicate with the
    # largest value-hash wins; indifferent for fully-identical rows).
    rt = right.where(F.col(by).isNotNull()).select(
        F.col(by),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.xxhash64(*[F.col(c) for c in value_cols]).alias("_tie"),
        *[F.col(c) for c in value_cols],
    )
    lcols = [c for c in left.columns]
    unioned = lt.select(
        *lcols,
        "_side",
        "_ats",
        F.lit(0).cast("long").alias("_tie"),
        *[F.lit(None).cast(rt.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    ).unionByName(
        rt.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c) if c != by else F.col(by)
                for c in lcols
            ],
            "_side",
            "_ats",
            "_tie",
            *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        )
    )
    # right rows sort before left rows at equal ts (_side 0 < 1), so an
    # exactly-simultaneous right row IS matched (ts_r <= ts_l); _tie
    # fixes the order among right duplicates at the same (key, ts).
    w = (
        W.partitionBy(by)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.select(
        *lcols,
        "_side",
        F.last(F.when(F.col("_side") == 0, F.col("_ats")), ignorenulls=True)
        .over(w)
        .alias("matched_ts"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(f"_r_{c}")), ignorenulls=True)
            .over(w)
            .alias(f"matched_{c}")
            for c in value_cols
        ],
    )
    return matched.where(F.col("_side") == 1).drop("_side")


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "t_start",
    end_col: str = "t_end",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join rows to the intervals containing them: explode each
    interval into the time buckets it overlaps, equi-join on bucket,
    exact range filter. Candidate count per row = intervals per
    bucket — linear, never a cross join. Explode span is computed from
    the actual bounds, so any interval length works.

    Only inner/left are supported: the interval side is exploded per
    bucket, so a right/full join would emit one null-extended row per
    SPANNED BUCKET of an unmatched interval instead of one per
    interval."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"how={how!r} unsupported: exploded intervals would duplicate "
            "null-extended rows; use inner or left (events side preserved)"
        )
    ev = events.withColumn(
        "_bucket", F.floor(epoch_us(F.col(ts_col)) / F.lit(bucket_seconds * 1_000_000))
    )
    iv = intervals.withColumn(
        "_b0", F.floor(epoch_us(F.col(start_col)) / F.lit(bucket_seconds * 1_000_000))
    ).withColumn(
        "_b1", F.floor(epoch_us(F.col(end_col)) / F.lit(bucket_seconds * 1_000_000))
    )
    iv = iv.withColumn("_bucket", F.explode(F.sequence("_b0", "_b1"))).drop("_b0", "_b1")
    # the range check rides IN the join condition (a post-join filter
    # would silently turn an outer join into an inner one)
    cond = (
        (ev["_bucket"] == iv["_bucket"])
        & (ev[ts_col] >= iv[start_col])
        & (ev[ts_col] <= iv[end_col])
    )
    joined = ev.join(iv, cond, how).drop(iv["_bucket"]).drop(ev["_bucket"])
    return joined
