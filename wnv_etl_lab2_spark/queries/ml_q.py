"""Distributed model training as combinable aggregations (round 10) —
the registry face of the engine's "training on Spark" tier
(`operators/clustering.py` k-means, `operators/bpe.py` BPE,
`operators/linalg.py` exact Gram): full-batch gradient-descent steps
for a logistic-regression quality classifier, where EVERY
corpus-sized computation is one map-side-combinable aggregate with
O(d) state and the model itself never leaves the plan.

Scale shape (the reason this belongs in the engine and not a
driver-side sklearn call): each GD step over a 100 TB embedding table
is ONE scan whose per-dimension gradient is a combinable aggregate —
map-side combine collapses every partition to d rows before the
exchange, so the shuffle is O(d x partitions) bytes regardless of
corpus size, and no corpus ROW is ever shuffled or collected. The
weight vector between steps is a 1-row broadcast frame (the
`corpus_dashboard` pattern), so the whole 2-step training is one
Catalyst plan costing exactly two corpus scans. This is how
large-scale quality classifiers for pretraining curation are fit (a
linear probe over frozen embeddings); the fastText-style classifier
the big corpora report reduces to the same gradient-as-aggregate
shape.

Reference parity: the reference pipeline has no model training
(SURVEY.md §2.2 — absent-from-reference category); this extends the
LLM-data-pipeline mandate alongside kmeans/BPE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table, spread_scan

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
    whose margins/sigmoids are JVM expressions (no Python anywhere).
    Output: one row per dimension with both steps' weights — the
    driver-verifiable training trace."""
    # Plan shape notes (both learned the expensive way — a first cut
    # with 64 per-dimension aggregate COLUMNS benched at 6.4 s where
    # this plan runs ~1.5 s at sf0.1, nearly all fixed overhead):
    # - the gradient is posexplode -> ONE combinable groupBy(pos)
    #   (the kmeans-UPDATE / covariance shape): map-side combine
    #   collapses every partition to 64 rows before the exchange, so
    #   the shuffle is O(d x partitions) — identical bytes to a
    #   64-wide aggregate, but the plan stays small enough to build
    #   (193 Py4J column objects measured 4.9 s of driver time) and
    #   codegen-compile (6 MiB task binaries otherwise);
    # - the margin is ONE zip_with/aggregate higher-order expression
    #   against the broadcast weight ARRAY — never 64 scalar terms,
    #   and no corpus-row shuffle anywhere (the explode feeds a
    #   combinable aggregate, not a per-row regroup).
    # spread_scan: both corpus passes explode 64 structs/row straight
    # off the scan; on a single-row-group file that whole Generate +
    # partial-agg runs on ONE core (guide §2.5 input skew). No-op at
    # scale (condition derived from row groups / input bytes).
    emb = spread_scan(load_table(spark, "embeddings", sf_dir), "vec_id")
    c = emb.select(
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
        F.col("embedding"),
    )
    # pass 1: per-dimension gradient sums (explode inline — exploding
    # a projected computed array re-evaluates it via
    # InferFiltersFromGenerate, see operators/dedup.py). n rides the
    # same aggregate: every row contributes one value per pos, so
    # count(pos rows) == corpus n. The 64-row result is NOT
    # materialized (round 18): its consumers (weight array, final w1,
    # final w2 join) reference the identical groupBy(pos) exchange, and
    # AQE's runtime stage reuse executes it ONCE (verified in the
    # finalized plan: the pos exchange and the spreading repartition
    # both come back as ReusedExchange) — so dropping the eager
    # localCheckpoint removes a whole synchronous job + driver barrier
    # from the wall (measured 0.94 -> 0.72 s at sf0.1, results
    # identical) while keeping the two-corpus-pass shape at any scale.
    d1 = c.select(
        "y",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )
    g1 = d1.groupBy("pos").agg(
        F.sum((F.col("y") - 0.5) * F.col("val")).alias("g"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    # the gradient becomes a broadcast weight ARRAY (the driver never
    # sees it): sort_array over collected (pos, g, n) structs keeps
    # index order deterministic
    w1row = g1.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "g", "n"))),
            lambda s: s.g / s.n,
        ).alias("ws")
    )
    # pass 2: margins/sigmoids as single HOF expressions per row
    j = c.crossJoin(F.broadcast(w1row))
    margin = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            F.col("ws"),
            lambda x, w: x * w,
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    sig = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("s")
    d2 = j.select(
        (sig - F.col("y")).alias("r"),
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )
    g2 = d2.groupBy("pos").agg(F.sum(F.col("r") * F.col("val")).alias("h"))
    return g1.join(g2, "pos").select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("g") / F.col("n"), 6).alias("w1"),
        F.round(F.col("g") / F.col("n") - F.col("h") / F.col("n"), 6).alias("w2"),
    )


@register(
    "embedding_centroid_auc",
    # Exact tie-aware AUC via the grouped Mann-Whitney identity —
    # never a pair join, never a row-level global window:
    #   AUC = sum_s [ p(s) * cum_neg_below(s) + p(s) * q(s) / 2 ]
    #         / (np * nn)
    # over DISTINCT scores s. Scores are ROUNDED to 6 before grouping
    # on both engines, so the grouping keys are bit-independent of
    # float summation order (an unrounded 1e-16 difference would
    # split a tie group).
    oracle=f"""
    WITH c AS (
      SELECT vec_id, label, {_CAST} AS e FROM embeddings
    ),
    dims AS (
      SELECT vec_id, u.pos AS pos, u.val AS val
      FROM c, LATERAL (SELECT UNNEST(e) AS val,
                              generate_subscripts(e, 1) AS pos) AS u
      WHERE vec_id % 2 = 0 AND (SELECT label FROM c c2 WHERE c2.vec_id = c.vec_id) = 0
    ),
    centroid AS (SELECT pos, AVG(val) AS cv FROM dims GROUP BY pos),
    test AS (
      SELECT c.vec_id,
             CASE WHEN c.label = 0 THEN 1 ELSE 0 END AS y,
             ROUND(SUM(u.val * ct.cv), 6) AS score
      FROM c,
           LATERAL (SELECT UNNEST(c.e) AS val,
                           generate_subscripts(c.e, 1) AS pos) AS u
      JOIN centroid ct ON ct.pos = u.pos
      WHERE c.vec_id % 2 = 1
      GROUP BY c.vec_id, c.label
    ),
    by_score AS (
      SELECT score,
             CAST(SUM(y) AS BIGINT) AS p,
             CAST(SUM(1 - y) AS BIGINT) AS q
      FROM test GROUP BY score
    ),
    cum AS (
      SELECT p, q,
             COALESCE(SUM(q) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
      FROM by_score
    )
    SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(q) AS BIGINT) AS n_neg,
           ROUND(SUM(p * neg_below + (p * q) / 2.0)
                 / (SUM(p) * SUM(q)), 6) AS auc
    FROM cum
    """,
)
def embedding_centroid_auc(spark, sf_dir):
    """Linear-probe EVALUATION: train a label-0 centroid on the even
    vec_ids, score the odd (held-out) vec_ids by dot product, and
    report exact tie-aware AUC for label-0 discrimination via the
    GROUPED Mann-Whitney identity — never a positive x negative pair
    join, and never a row-level global window (a row_number over the
    whole test set would pull the corpus into one partition): the
    test set first collapses to a per-DISTINCT-score (p, q) count
    table via one combinable groupBy, and the only ordered pass is
    the cumulative window over that score-distribution table —
    bounded by the number of distinct rounded scores, the same shape
    as the quantile/RFM queries. This is the eval half of the
    training tier (`logreg_gd_steps` fits; this measures)."""
    emb = load_table(spark, "embeddings", sf_dir)
    train = emb.where((F.col("vec_id") % 2 == 0) & (F.col("label") == 0))
    d1 = train.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "val"
        )
    )
    centroid = (
        d1.groupBy("pos")
        .agg(F.avg("val").alias("cv"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
            ).alias("c")
        )
    )
    test = emb.where(F.col("vec_id") % 2 == 1).crossJoin(F.broadcast(centroid))
    score = F.round(
        F.aggregate(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                F.col("c"),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        6,
    )
    scored = test.select(
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
        score.alias("score"),
    )
    by_score = scored.groupBy("score").agg(
        F.sum("y").cast("long").alias("p"),
        F.sum(1 - F.col("y")).cast("long").alias("q"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = by_score.select(
        "p", "q", F.coalesce(F.sum("q").over(w), F.lit(0)).alias("neg_below")
    )
    return cum.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("q").cast("long").alias("n_neg"),
        F.round(
            F.sum(F.col("p") * F.col("neg_below") + (F.col("p") * F.col("q")) / 2.0)
            / (F.sum("p") * F.sum("q")),
            6,
        ).alias("auc"),
    )


@register(
    "embedding_pca_power_iteration",
    # The oracle unrolls the same two power iterations over the same
    # double-precision Gram: v0 = 1/8 (uniform, deterministic — no
    # randomness, no sign ambiguity), v1 = normalize(G v0),
    # v2 = normalize(G v1). Gram entries are float sums whose
    # engine-order differences (~1e-13 relative) stay ~1e-12 through
    # two normalized iterations — absorbed by the shared ROUND(_, 6).
    oracle=f"""
    WITH c AS (SELECT {_CAST} AS e FROM embeddings),
    gram AS (
      SELECT i.pos AS i, j.pos AS j, SUM(i.val * j.val) AS g
      FROM c,
           LATERAL (SELECT UNNEST(e) AS val,
                           generate_subscripts(e, 1) AS pos) AS i,
           LATERAL (SELECT UNNEST(e) AS val,
                           generate_subscripts(e, 1) AS pos) AS j
      GROUP BY i.pos, j.pos
    ),
    u1 AS (SELECT i, SUM(g) / 8.0 AS u FROM gram GROUP BY i),
    n1 AS (SELECT SQRT(SUM(u * u)) AS nm FROM u1),
    v1 AS (SELECT i, u / (SELECT nm FROM n1) AS v FROM u1),
    u2 AS (
      SELECT gram.i AS i, SUM(gram.g * v1.v) AS u
      FROM gram JOIN v1 ON v1.i = gram.j
      GROUP BY gram.i
    ),
    n2 AS (SELECT SQRT(SUM(u * u)) AS nm FROM u2),
    ray AS (
      SELECT SUM(u2.u * v1.v) AS num FROM u2 JOIN v1 USING (i)
    )
    SELECT CAST(u2.i AS INT) AS dim,
           ROUND(u2.u / (SELECT nm FROM n2), 6) AS loading,
           ROUND((SELECT num FROM ray), 4) AS eigenvalue_est
    FROM u2
    """,
)
def embedding_pca_power_iteration(spark, sf_dir):
    """PCA top component by MATRIX-FREE power iteration, fully
    in-plan: G v = sum_rows x (x . v), so each unrolled iteration is
    one corpus pass — a per-row dot product against the broadcast
    iterate (one zip_with/aggregate HOF) feeding ONE combinable
    d-keyed aggregate (map-side combine to 64 rows per partition; the
    kmeans/logreg shuffle shape) — and the 64x64 Gram never
    materializes. v0 is the uniform vector, so iteration 1's dot is a
    plain row-sum; the Rayleigh quotient v1^T G v1 rides along as the
    eigenvalue estimate. At 100 TB: two scans, two d x partitions
    shuffles, everything after is 64-row frames — the classic
    scalable PCA-without-a-solver; more iterations are the same pass
    repeated."""
    # MATRIX-FREE: G v = sum_rows x (x . v), so each iteration is one
    # corpus pass with a d-key combinable aggregate — the Gram never
    # materializes and nothing ever shuffles more than d x partitions
    # rows. (A first cut materialized G via a d^2 struct fan-out:
    # 4096-key shuffle, 8M struct allocations, benched 3.4 s at sf0.1
    # vs ~1.3 s for this shape. The ORACLE still goes through the
    # explicit Gram — same math, different associativity, absorbed by
    # the shared rounding.)
    # spread_scan: see logreg_gd_steps — the per-pass posexplode runs
    # on one core off a single-row-group scan; no-op at scale.
    emb = spread_scan(load_table(spark, "embeddings", sf_dir), "vec_id")
    e = F.transform("embedding", lambda x: x.cast("double"))
    # pass 1: u1 = G v0 with v0 uniform = per-row scalar s = sum(x)/8,
    # then one d-key aggregate of x_i * s. NOT checkpointed (round 18):
    # its three consumers (weight array, v1 frame, norm) reference the
    # identical groupBy(pos) exchange, which AQE's runtime stage reuse
    # executes once (ReusedExchange in the finalized plan) — dropping
    # the two eager localCheckpoints here and on u2 removes two
    # synchronous jobs/driver barriers (measured 1.17 -> 1.03 s at
    # sf0.1, results identical; same pass count at any scale).
    s0 = F.aggregate(e, F.lit(0.0), lambda a, x: a + x) / 8.0
    d1 = emb.select(s0.alias("s"), F.posexplode(e).alias("pos", "val"))
    u1 = d1.groupBy("pos").agg(F.sum(F.col("val") * F.col("s")).alias("u"))
    # v1 as a normalized broadcast ARRAY in one expression chain
    v1row = u1.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "u"))), lambda s: s.u
        ).alias("us")
    ).select(
        F.transform(
            "us",
            lambda x: x
            / F.sqrt(F.aggregate("us", F.lit(0.0), lambda a, y: a + y * y)),
        ).alias("vs")
    )
    # pass 2: u2 = G v1 = per-row margin m = x . v1, then x_i * m
    j = emb.crossJoin(F.broadcast(v1row))
    m = F.aggregate(
        F.zip_with(e, F.col("vs"), lambda x, w: x * w),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    d2 = j.select(m.alias("m"), F.posexplode(e).alias("pos", "val"))
    u2 = d2.groupBy("pos").agg(F.sum(F.col("val") * F.col("m")).alias("u"))
    n1 = u1.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nm"))
    v1 = u1.crossJoin(F.broadcast(n1)).select(
        "pos", (F.col("u") / F.col("nm")).alias("v")
    )
    n2 = u2.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nm"))
    ray = u2.join(v1, "pos").agg(F.sum(F.col("u") * F.col("v")).alias("num"))
    return (
        u2.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(ray))
        .select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.round(F.col("u") / F.col("nm"), 6).alias("loading"),
            F.round(F.col("num"), 4).alias("eigenvalue_est"),
        )
    )


# Welch's t is computed from EXACT integer moments (n, sum, sum of
# squares — n_chars is integral, so the three aggregates are exact
# BIGINTs on both engines) and the final expression is one shared
# arithmetic shape over them: variance = (ss - s^2/n) / (n-1), then
# t = (m0-m1)/sqrt(v0/n0+v1/n1) and the Welch-Satterthwaite dof. The
# only floating point anywhere is that final expression, identical
# text on both sides, so the statistic is bit-reproducible.
_WELCH_FINAL = """
    ROUND((s0/n0 - s1/n1) / SQRT(
        ((ss0 - s0*s0/n0) / (n0 - 1)) / n0 +
        ((ss1 - s1*s1/n1) / (n1 - 1)) / n1
    ), 6) AS t_stat,
    ROUND(
        POW(((ss0 - s0*s0/n0) / (n0 - 1)) / n0 +
            ((ss1 - s1*s1/n1) / (n1 - 1)) / n1, 2)
        / (
            POW(((ss0 - s0*s0/n0) / (n0 - 1)) / n0, 2) / (n0 - 1) +
            POW(((ss1 - s1*s1/n1) / (n1 - 1)) / n1, 2) / (n1 - 1)
        ), 2) AS welch_dof,
    CAST(n0 AS BIGINT) AS n_src0,
    CAST(n1 AS BIGINT) AS n_src1
"""


@register(
    "welch_ttest_sources",
    oracle=f"""
    WITH m AS (
        SELECT
            CAST(SUM(CASE WHEN source='src0' THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
            CAST(SUM(CASE WHEN source='src0' THEN n_chars ELSE 0 END) AS DOUBLE) AS s0,
            CAST(SUM(CASE WHEN source='src0' THEN n_chars*n_chars ELSE 0 END) AS DOUBLE) AS ss0,
            CAST(SUM(CASE WHEN source='src1' THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
            CAST(SUM(CASE WHEN source='src1' THEN n_chars ELSE 0 END) AS DOUBLE) AS s1,
            CAST(SUM(CASE WHEN source='src1' THEN n_chars*n_chars ELSE 0 END) AS DOUBLE) AS ss1
        FROM documents WHERE source IN ('src0','src1')
    )
    SELECT {_WELCH_FINAL} FROM m
    """,
)
def welch_ttest_sources(spark, sf_dir):
    """Welch's unequal-variance t-test between two sources'
    document-length distributions (round 11): the mean-shift
    significance gate that pairs with `ks_drift_sources`' shape gate
    when a crawl slice is swapped. ONE combinable aggregation computes
    the exact integer moments (count/sum/sum-of-squares per source —
    map-side partials, 1 row out); the t statistic and
    Welch-Satterthwaite degrees of freedom are a single shared
    arithmetic expression over those six numbers, evaluated from
    IDENTICAL text in Spark and the oracle. Scale: one corpus scan,
    6-number shuffle, O(1) result — the cheapest possible two-sample
    test at 100 TB."""
    d = load_table(spark, "documents", sf_dir).where(
        F.col("source").isin("src0", "src1")
    )
    m = d.agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).cast("double").alias("n0"),
        F.sum(F.when(F.col("source") == "src0", F.col("n_chars")).otherwise(0)).cast("double").alias("s0"),
        F.sum(
            F.when(F.col("source") == "src0", F.col("n_chars") * F.col("n_chars")).otherwise(0)
        ).cast("double").alias("ss0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("source") == "src1", F.col("n_chars")).otherwise(0)).cast("double").alias("s1"),
        F.sum(
            F.when(F.col("source") == "src1", F.col("n_chars") * F.col("n_chars")).otherwise(0)
        ).cast("double").alias("ss1"),
    )
    return m.selectExpr(*[e.strip() for e in _split_select(_WELCH_FINAL)])


def _split_select(fragment: str) -> list[str]:
    """Split a SQL select-list fragment on TOP-LEVEL commas (commas
    inside parentheses stay put) so the same text feeds both the
    oracle and Spark's selectExpr."""
    parts, depth, cur = [], 0, []
    for ch in fragment:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p for p in (x.strip() for x in parts) if p]
