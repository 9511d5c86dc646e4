"""Per-source score calibration: the sketch-based production path
(`curation.source_quantile_keep`) must agree with the exact
percent-rank form (`source_quantile_normalize`, the driver-checked
oracle semantics) up to the declared sketch tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.curation import source_quantile_keep
from wnv_etl_lab2_spark.sources.catalog import load_table


def _scored(spark, sf_dir):
    # identical score definition to the source_quantile_normalize query
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        "source",
        F.round(
            F.size(F.array_distinct(F.split("text", " ")))
            * 1.0
            / F.size(F.split("text", " ")),
            6,
        ).alias("qscore"),
    )


def test_sketch_keep_agrees_with_exact_percent_rank(spark, sf_dir):
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    exact = {
        r.doc_id
        for r in REGISTRY["source_quantile_normalize"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.doc_id
        for r in source_quantile_keep(
            _scored(spark, sf_dir), "qscore", "source", keep_frac=0.5
        ).collect()
    }
    # Declared tolerance: disagreement is confined to the sketch's
    # rank-error band around each source's boundary — >= 99% Jaccard
    # agreement of the keep sets, and neither side may collapse.
    inter = len(exact & approx)
    union = len(exact | approx)
    assert union > 0 and inter / union >= 0.99, (len(exact), len(approx), inter)


def test_sketch_keep_respects_per_source_fraction(spark, sf_dir):
    scored = _scored(spark, sf_dir)
    kept = source_quantile_keep(scored, "qscore", "source", keep_frac=0.5)
    tot = {r.source: r.n for r in scored.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    got = {r.source: r.n for r in kept.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for s, n in tot.items():
        frac = got.get(s, 0) / n
        # keep >= is inclusive at the boundary, so the kept fraction
        # sits at-or-just-above the target; ties can push it higher
        assert 0.45 <= frac <= 0.65, (s, frac)


def test_sketch_keep_plan_is_broadcast_map_side(spark, sf_dir):
    plan = (
        source_quantile_keep(_scored(spark, sf_dir), "qscore", "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # boundary table broadcasts
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan  # no per-source total order anywhere
