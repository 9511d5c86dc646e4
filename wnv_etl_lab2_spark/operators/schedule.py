"""Full-corpus materialization of the stride-interleave schedule.

`queries/sampling_q.interleave_mixture_schedule` is the oracle-exact
HEAD of the schedule (top-k by virtual time — TakeOrdered, bounded);
this operator materializes the ENTIRE schedule with a global position
per document, which a driver-side window (`row_number() OVER (ORDER BY
...)`) cannot do at scale — an unpartitioned window moves the whole
corpus through one task.

The scalable decomposition (the standard distributed ranking):

1. `repartitionByRange` on the schedule order — Spark's native
   scalable sort primitive (sampled range boundaries, one exchange,
   each output partition owns a contiguous schedule segment);
2. `sortWithinPartitions` — local sort, no further movement;
3. per-partition LOCAL indexes decoded from
   `monotonically_increasing_id()` (bits 33+ are the partition id,
   low 33 bits the within-partition row index — valid exactly here
   because the id is stamped on the sorted output of an explicit-N
   repartition, which AQE never coalesces);
4. per-partition row COUNTS (a |partitions|-row aggregate) turned
   into exclusive prefix offsets on the driver-sized frame and
   broadcast back — global position = offset[pid] + local + 1.

Total cost: ONE range exchange of the corpus + one |partitions|-row
aggregate + a broadcast join. Nothing corpus-sized ever lands in a
single task, which is the entire point vs the window form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _stamped(
    df: DataFrame,
    source_col: str,
    weight_col: str,
    order_col: str,
    num_ranges: int | None,
) -> DataFrame:
    """The range-partitioned, locally-sorted frame with per-partition
    id stamps — the plan the checkpoint in
    `stride_interleave_positions` pins. Factored out so the plan shape
    (range exchange, no corpus-sized single-partition window) stays
    assertable in tests despite the checkpoint truncating lineage."""
    spark = df.sparkSession
    n = num_ranges or int(spark.conf.get("spark.sql.shuffle.partitions"))
    rnk = F.row_number().over(
        Window.partitionBy(source_col).orderBy(F.col(order_col))
    )
    v = df.withColumn("vtime", rnk * F.lit(1.0) / F.col(weight_col))
    return (
        v.repartitionByRange(n, "vtime", source_col, order_col)
        .sortWithinPartitions("vtime", source_col, order_col)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", 33))
    )


def stride_interleave_positions(
    df: DataFrame,
    source_col: str = "source",
    weight_col: str = "wt",
    order_col: str = "doc_id",
    num_ranges: int | None = None,
) -> DataFrame:
    """Global stride-schedule positions for every row of ``df``
    (columns: ``source_col``, integer ``weight_col``, unique
    ``order_col``): source s's r-th document runs at virtual time
    r / w_s, and ``position`` is the 1-based global rank in
    (vtime, source, order) order — identical ordering semantics to the
    head query, materialized corpus-wide.

    The per-source rank is one PARTITIONED window (per-source state,
    shuffle on source; for corpus-sized single sources the same
    offset decomposition used for the global position applies — see
    `deterministic_shuffle_order`'s docstring); the GLOBAL position
    uses the range-partition + offset decomposition described in the
    module docstring instead of an unpartitioned window."""
    # The stamped frame feeds TWO plan branches (the counts/offsets
    # side and the join side). Its ids are only consistent across both
    # if they read the SAME evaluated partitioning — relying on Spark
    # reusing the shuffle exchange is fragile (a canonicalization miss
    # or a task retry that re-samples range boundaries would let
    # `_pid`/`_mid` silently differ between branches), so the stamp is
    # materialized ONCE with an eager localCheckpoint and both
    # branches read the pinned result (round-10 advisory fix). This
    # makes the operator run its jobs at call time; the frame it
    # returns was always corpus-sized work, so the materialization is
    # the price of deterministic global positions, not overhead.
    mid = _stamped(df, source_col, weight_col, order_col, num_ranges).localCheckpoint(
        eager=True
    )
    counts = mid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    local = F.col("_mid") - (F.col("_pid") * F.lit(1 << 33))
    return (
        mid.join(F.broadcast(offsets), "_pid")
        .withColumn("position", (F.col("_off") + local + 1).cast("long"))
        .drop("_mid", "_pid", "_off")
    )
