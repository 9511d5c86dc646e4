"""Full-schedule stride interleave: the scalable range-partition +
offset decomposition must produce exactly the positions the naive
global-window form would, and its head must equal the oracle-checked
head query."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.operators.schedule import stride_interleave_positions
from wnv_etl_lab2_spark.sources.catalog import load_table


def _weighted_docs(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    wt = (F.regexp_extract("source", "([0-9]+)$", 1).cast("int") % 4 + 1).alias("wt")
    return d.select("doc_id", "source", wt)


def test_positions_match_naive_global_order(spark, sf_dir):
    full = stride_interleave_positions(_weighted_docs(spark, sf_dir)).collect()
    n = len(full)
    # gap-free 1..N permutation
    assert sorted(r.position for r in full) == list(range(1, n + 1))
    # identical to the naive driver-side ordering
    naive = sorted(full, key=lambda r: (r.vtime, r.source, r.doc_id))
    for want, row in zip(range(1, n + 1), naive):
        assert row.position == want, (row, want)


def test_full_schedule_head_equals_head_query(spark, sf_dir):
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    head = {
        (r.position, r.doc_id)
        for r in REGISTRY["interleave_mixture_schedule"].fn(spark, sf_dir).collect()
    }
    full = stride_interleave_positions(_weighted_docs(spark, sf_dir))
    got = {
        (r.position, r.doc_id)
        for r in full.where(F.col("position") <= 200).collect()
    }
    assert got == head


def test_plan_is_range_partitioned_not_single_window(spark, sf_dir):
    # the stamped (pre-checkpoint) plan carries the range exchange; the
    # public operator checkpoints it, truncating lineage, so the plan
    # shape is asserted on the factored-out stamp stage
    from wnv_etl_lab2_spark.operators.schedule import _stamped

    stamp_plan = (
        _stamped(_weighted_docs(spark, sf_dir), "source", "wt", "doc_id", None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in stamp_plan, stamp_plan
    plan = (
        stride_interleave_positions(_weighted_docs(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-sized path must never pass through a single-partition
    # global sort+window; the only SinglePartition exchange feeds the
    # |partitions|-row offsets frame
    corpus_single = [
        ln
        for ln in plan.splitlines()
        if "Exchange SinglePartition" in ln and "_cnt" not in ln and "count" not in ln
    ]
    assert len(corpus_single) <= 1, plan
    # both consumer branches read the pinned checkpoint, not a re-run
    # of the exchange
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan
