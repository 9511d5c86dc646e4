"""Distributed model training as combinable aggregations (round 10) —
the registry face of the engine's "training on Spark" tier
(`operators/clustering.py` k-means, `operators/bpe.py` BPE,
`operators/linalg.py` exact Gram): full-batch gradient-descent steps
for a logistic-regression quality classifier, where EVERY
corpus-sized computation is one map-side-combinable aggregate with
O(d) state and the model itself never leaves the plan.

Scale shape (the reason this belongs in the engine and not a
driver-side sklearn call): each GD step over a 100 TB embedding table
is ONE scan emitting 64 partial sums per task — no shuffle of rows,
no explode, no collect. The weight vector between steps is a 1-row
frame broadcast into the next pass (the `corpus_dashboard` pattern),
so the whole 2-step training is a single Catalyst plan. This is
exactly how large-scale quality classifiers for pretraining curation
are fit (a linear probe over frozen embeddings); the fastText-style
classifier the big corpora report reduces to the same
gradient-as-aggregate shape.

Reference parity: the reference pipeline has no model training
(SURVEY.md §2.2 — absent-from-reference category); this extends the
LLM-data-pipeline mandate alongside kmeans/BPE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.operators.similarity import as_double_array
from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table

_DIM = 64
_CAST = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


@register(
    "logreg_gd_steps",
    # The oracle replays both full-batch GD steps (w0 = 0, lr = 1):
    #   w1 = (1/n) SUM (y - 0.5) x          [sigmoid(0) = 0.5]
    #   w2 = w1 - (1/n) SUM (sigmoid(w1.x) - y) x
    # DuckDB unnests to (vec_id, pos, val) and groups where Spark
    # keeps 64 aggregate columns — same multiset of doubles, order
    # differences ~1e-13 relative, absorbed by the shared ROUND(_, 6).
    oracle=f"""
    WITH c AS (
      SELECT vec_id,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y,
             {_CAST} AS e
      FROM embeddings
    ),
    n AS (SELECT COUNT(*) AS n FROM c),
    dims AS (
      SELECT vec_id, y, u.pos AS pos, u.val AS val
      FROM c, LATERAL (SELECT UNNEST(e) AS val,
                              generate_subscripts(e, 1) AS pos) AS u
    ),
    w1 AS (
      SELECT pos, SUM((y - 0.5) * val) / (SELECT n FROM n) AS w1
      FROM dims GROUP BY pos
    ),
    margin AS (
      SELECT d.vec_id, d.y, SUM(d.val * w.w1) AS m
      FROM dims d JOIN w1 w USING (pos)
      GROUP BY d.vec_id, d.y
    ),
    sig AS (SELECT vec_id, y, 1.0 / (1.0 + EXP(-m)) AS s FROM margin),
    g2 AS (
      SELECT d.pos, SUM((s.s - s.y) * d.val) / (SELECT n FROM n) AS g
      FROM dims d JOIN sig s USING (vec_id)
      GROUP BY d.pos
    )
    SELECT CAST(w.pos AS INT) AS dim,
           ROUND(w.w1, 6) AS w1,
           ROUND(w.w1 - g.g, 6) AS w2
    FROM w1 w JOIN g2 g USING (pos)
    """,
)
def logreg_gd_steps(spark, sf_dir):
    """Two full-batch logistic-regression GD steps (target: label ==
    0, features: the 64-dim embedding, w0 = 0, lr = 1) trained
    entirely inside one Catalyst plan. Step 1 exploits sigmoid(0) =
    0.5 so the first gradient is a plain linear aggregate; the
    resulting 1-row weight frame broadcasts into the second pass,
    whose margins/sigmoids are JVM expressions (no Python, no
    explode). Output: one row per dimension with both steps' weights
    — the driver-verifiable training trace."""
    emb = load_table(spark, "embeddings", sf_dir)
    c = emb.select(
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
        as_double_array("embedding").alias("e"),
    )
    # pass 1: n plus 64 gradient sums in ONE combinable aggregate
    agg1 = c.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[
            F.sum((F.col("y") - F.lit(0.5)) * F.element_at("e", i + 1)).alias(f"g{i}")
            for i in range(_DIM)
        ],
    )
    w1 = agg1.select(
        "n", *[(F.col(f"g{i}") / F.col("n")).alias(f"w{i}") for i in range(_DIM)]
    )
    # pass 2: margins against the broadcast 1-row weight frame
    j = c.crossJoin(F.broadcast(w1))
    margin = sum(
        (F.element_at("e", i + 1) * F.col(f"w{i}") for i in range(_DIM)),
        start=F.lit(0.0),
    )
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    agg2 = j.agg(
        # the weight columns are constant over the cross-joined rows;
        # F.min re-emits them deterministically alongside the sums
        *[F.min(f"w{i}").alias(f"w{i}") for i in range(_DIM)],
        F.min("n").alias("n"),
        *[
            F.sum((sig - F.col("y")) * F.element_at("e", i + 1)).alias(f"h{i}")
            for i in range(_DIM)
        ],
    )
    per_dim = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("int").alias("dim"),
                F.round(F.col(f"w{i}"), 6).alias("w1"),
                F.round(F.col(f"w{i}") - F.col(f"h{i}") / F.col("n"), 6).alias("w2"),
            )
            for i in range(_DIM)
        ]
    )
    return agg2.select(F.explode(per_dim).alias("r")).select("r.dim", "r.w1", "r.w2")
