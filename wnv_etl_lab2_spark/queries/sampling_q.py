"""Deterministic sampling queries over `documents` — the corpus-
construction ops of a training-data pipeline (subset selection and
per-stratum quotas) built so the SAME rows are chosen on every run,
every partitioning, and every engine.

`df.sample()` is wrong for this job twice over: it is seed-dependent
per-partition (a repartition changes the chosen rows) and it cannot be
replayed by another engine. Keyed modular arithmetic gives a stable
pseudo-random order both Spark and DuckDB compute bit-identically:
`(doc_id * 2654435761) % M` (Knuth's multiplicative hash constant;
doc_id < 2^31 keeps the product far inside a 64-bit long, so ANSI mode
never overflows).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table, spread_scan

# shared SQL fragment — identical text on both engines
_KEY_HASH = "(doc_id * 2654435761) % 100"
_ORD_HASH = "(doc_id * 2654435761) % 9973"  # prime modulus: few ties


@register(
    "deterministic_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_KEY_HASH} < 10
    """,
)
def deterministic_sample(spark, sf_dir):
    """~10% Bernoulli-by-key sample: a row is in or out based only on
    its key, so the sample is reproducible across runs, engines, and
    repartitionings; the predicate evaluates inside the scan stage —
    a pure map, no shuffle at any scale. The standard train/holdout
    split primitive."""
    d = load_table(spark, "documents", sf_dir)
    return d.where(F.expr(_KEY_HASH) < 10).select("doc_id", "lang", "source")


@register(
    "stratified_sample_topk",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_ORD_HASH} ASC, doc_id ASC
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, rn FROM ranked WHERE rn <= 20
    """,
)
def stratified_sample_topk(spark, sf_dir):
    """Exactly-k-per-stratum sample: rank each language's docs by the
    keyed hash (deterministic pseudo-random order, doc_id tie-break)
    and keep the first 20. One shuffle on the stratum key; the rank
    window never holds more than a partition's rows. The per-class
    quota primitive for balanced training mixes."""
    d = load_table(spark, "documents", sf_dir)
    w = W.partitionBy("lang").orderBy(F.expr(_ORD_HASH).asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
    )


@register(
    "deterministic_shuffle_order",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, md5('shuf42-' || CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
    )
    SELECT doc_id, source,
           CAST(('0x' || substr(hk, 1, 8))::UBIGINT % 8 AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY ('0x' || substr(hk, 1, 8))::UBIGINT % 8
             ORDER BY hk, doc_id
           ) AS BIGINT) AS pos_in_shard
    FROM h
    """,
)
def deterministic_shuffle_order(spark, sf_dir):
    """Training-order preparation: a seeded, engine-portable global
    shuffle of the corpus plus shard assignment — the step right
    before writing training shards, where order must be random-like
    but REPRODUCIBLE (resume a run, re-emit shard k, audit a batch).
    Key = md5 of a seeded doc-id string, shard = 32 bits of the key
    mod n_shards, position = rank of the key within the shard.

    Scale shape: one shuffle on shard (the write partitioning you
    want anyway), per-shard sort for positions — no global sort, no
    driver involvement; shards are balanced by construction (hash
    mod). Changing the seed string re-deals the entire order."""
    d = load_table(spark, "documents", sf_dir)
    from pyspark.sql.window import Window

    hk = F.md5(F.concat(F.lit("shuf42-"), F.col("doc_id").cast("string")))
    shard = (F.conv(F.substring(hk, 1, 8), 16, 10).cast("long") % 8).alias("shard")
    h = d.select("doc_id", "source", hk.alias("hk"), shard)
    w = Window.partitionBy("shard").orderBy(F.col("hk").asc(), F.col("doc_id").asc())
    return h.select(
        "doc_id",
        "source",
        "shard",
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


@register(
    "mixture_resample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, LEN(string_split(text, ' ')) AS n_words
      FROM documents
    ),
    src AS (
      SELECT source, SUM(n_words) AS src_words FROM w GROUP BY source
    ),
    tot AS (
      SELECT SUM(src_words) * 1.0 / COUNT(*) AS target_words FROM src
    ),
    f AS (
      SELECT s.source, t.target_words / s.src_words AS factor
      FROM src s CROSS JOIN tot t
    )
    SELECT w.doc_id, w.source,
           CAST(FLOOR(f.factor) +
                CASE WHEN ('0x' || substr(md5('mix42-' || CAST(w.doc_id AS VARCHAR)), 1, 8))::UBIGINT
                          < (f.factor - FLOOR(f.factor)) * 4294967296.0
                     THEN 1 ELSE 0 END AS BIGINT) AS n_copies
    FROM w JOIN f ON w.source = f.source
    """,
)
def mixture_resample(spark, sf_dir):
    """Source-mixture materialization: turn target weights into a
    concrete, deterministic per-document COPY COUNT — the step between
    'we want every source to contribute equal tokens' and an actual
    resampled corpus. factor = target_tokens / source_tokens; each doc
    gets floor(factor) guaranteed copies plus one more iff a seeded
    per-doc hash falls under the fractional part — stochastic rounding
    with zero RNG state, so the resample is reproducible and the
    expected token share is exact.

    Scale shape: the per-source token totals are a tiny aggregate
    broadcast back onto the scan (the join key has ~|sources| rows);
    the copy decision is then a pure map. The downstream explode
    (sequence(1, n_copies)) is the one fan-out and is bounded by the
    max upsample factor a mixture config would ever declare."""
    d = load_table(spark, "documents", sf_dir)
    w = d.select("doc_id", "source", F.size(F.split("text", " ")).alias("n_words"))
    src = w.groupBy("source").agg(F.sum("n_words").alias("src_words"))
    tot = src.agg(
        (F.sum("src_words") * 1.0 / F.count(F.lit(1))).alias("target_words")
    )
    f = src.crossJoin(F.broadcast(tot)).select(
        "source", (F.col("target_words") / F.col("src_words")).alias("factor")
    )
    frac_hash = F.conv(
        F.substring(F.md5(F.concat(F.lit("mix42-"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    n_copies = (
        F.floor("factor")
        + F.when(
            frac_hash < (F.col("factor") - F.floor("factor")) * F.lit(4294967296.0),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("long")
    return (
        w.join(F.broadcast(f), "source")
        .select("doc_id", "source", n_copies.alias("n_copies"))
    )


@register(
    "skew_key_diagnosis",
    oracle="""
    WITH f AS (
      SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ),
    t AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys, MAX(n) AS max_n FROM f)
    SELECT f.key, f.n,
           ROUND(f.n * 1.0 / t.total, 6) AS share,
           ROUND(f.n * t.n_keys * 1.0 / t.total, 4) AS x_mean,
           CAST(t.max_n AS BIGINT) AS max_key_n
    FROM f CROSS JOIN t
    ORDER BY f.n DESC, f.key LIMIT 20
    """,
)
def skew_key_diagnosis(spark, sf_dir):
    """Shuffle-skew diagnosis: the top-20 heaviest join/agg keys with
    their share of all rows and their multiple of the mean key size —
    the numbers that decide between plain hash partitioning, AQE skew
    splitting, and salting (operators/skew.py), read off BEFORE a job
    melts an executor rather than after.

    Scale shape: one map-side-combined count per key, a one-row global
    total broadcast back, TakeOrdered for the top-20 — the diagnosis
    never costs more than the aggregation it is diagnosing."""
    o = load_table(spark, "orders", sf_dir)
    f = o.groupBy(F.col("o_custkey").alias("key")).agg(F.count(F.lit(1)).alias("n"))
    t = f.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
    )
    return (
        f.crossJoin(F.broadcast(t))
        .select(
            "key",
            "n",
            F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("share"),
            F.round(F.col("n") * F.col("n_keys") * 1.0 / F.col("total"), 4).alias("x_mean"),
            F.col("max_n").cast("long").alias("max_key_n"),
        )
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(20)
    )


@register(
    "weighted_sample_es",
    # Efraimidis-Spirakis weighted sampling WITHOUT replacement:
    # per-row key ln(u)/w (monotone transform of u^(1/w)); the top-k
    # keys ARE the weighted sample. u derives from the md5 word both
    # engines share bit-for-bit, so the whole draw is deterministic
    # and exactly oracle-checkable.
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1)
                / 4294967296.0) / n_chars AS es_key
      FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
           ROUND(es_key, 9) AS es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id ASC
    LIMIT 25
    """,
)
def weighted_sample_es(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis):
    each row draws key = ln(u)/w from a deterministic md5-derived
    uniform u and its weight w (n_chars — length-proportional
    sampling); the k largest keys are exactly a weighted sample
    without replacement. THE distributed-reservoir primitive: at
    100 TB the plan is a pure map plus one TakeOrdered(k) — no
    shuffle of data rows, no state, and re-running it reproduces the
    identical sample (seeded by the id hash, not an RNG)."""
    d = load_table(spark, "documents", sf_dir)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            F.round(key, 9).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
        .limit(25)
    )


@register(
    "train_val_test_split",
    # Deterministic 80/10/10 split by md5-hash bucket (engine-shared),
    # reported as the per-(source, split) yield sheet. The assignment
    # is a pure function of doc_id — stable across runs, machines, and
    # partitionings, which is what makes a split REPRODUCIBLE.
    oracle="""
    WITH assigned AS (
      SELECT source,
             CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT source, text,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100 AS b
        FROM documents
      )
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM assigned GROUP BY source, split
    """,
)
def train_val_test_split(spark, sf_dir):
    """Reproducible 80/10/10 train/val/test assignment by hash bucket
    (md5 of the doc id — a pure function of the row, so the split is
    identical across runs, partitionings, and engines), reported as
    the per-(source, split) doc and token yield. A pure map plus one
    combinable aggregate: at 100 TB the assignment costs nothing
    beyond the scan, and downstream jobs re-derive membership from
    the id instead of joining a membership table."""
    d = load_table(spark, "documents", sf_dir)
    b = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 100
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        d.select(
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            split.alias("split"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


@register(
    "split_leakage_check",
    # Decontamination of the HASH SPLIT itself: for each test-split
    # document, the fraction of its distinct word-3-grams that appear
    # in the train split — the audit run after train_val_test_split
    # and before training. Same hash-bucket assignment, same inverted-
    # index shape as decontamination_overlap (whose split key is the
    # source label instead).
    oracle="""
    WITH assigned AS (
      SELECT doc_id, text,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                       % 100 < 80 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                       % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    docs AS (SELECT doc_id, split, string_split(text, ' ') AS words FROM assigned),
    sh AS (
        SELECT doc_id, split,
               list_distinct(list_transform(range(1, LEN(words) - 1),
                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingles
        FROM docs WHERE LEN(words) >= 3
    ),
    ex AS (SELECT doc_id, split, UNNEST(shingles) AS shingle FROM sh),
    train AS (SELECT DISTINCT shingle FROM ex WHERE split = 'train'),
    test_g AS (SELECT doc_id, shingle FROM ex WHERE split = 'test'),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM test_g GROUP BY doc_id),
    hit AS (SELECT doc_id, COUNT(*) AS n_shared
            FROM test_g e JOIN train t USING (shingle) GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
           ROUND(COALESCE(h.n_shared, 0) * 1.0 / t.n_grams, 6) AS leakage
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
)
def split_leakage_check(spark, sf_dir):
    """Leakage audit of the hash split: per test-split document, the
    fraction of its distinct word-3-grams found anywhere in the train
    split — run after `train_val_test_split`, before training. The
    train side collapses to a DISTINCT hashed-gram vocabulary and the
    probe is a gram equi-join (inverted-index shape, never doc x
    doc), identical scale behavior to `decontamination_overlap`."""
    from wnv_etl_lab2_spark.operators.dedup import hashed_word_shingles

    d = load_table(spark, "documents", sf_dir)
    b = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 100
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    words = F.split("text", " ")
    docs = d.select("doc_id", split.alias("split"), words.alias("words")).where(
        F.size("words") >= 3
    )
    ex = docs.select(
        "doc_id", "split", F.explode(hashed_word_shingles("words")).alias("shingle")
    )
    train = ex.where(F.col("split") == "train").select("shingle").distinct()
    test_g = ex.where(F.col("split") == "test").select("doc_id", "shingle")
    tot = test_g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hit = test_g.join(train, "shingle").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return tot.join(hit, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        F.round(
            F.coalesce("n_shared", F.lit(0)) * 1.0 / F.col("n_grams"), 6
        ).alias("leakage"),
    )


@register(
    "quota_sample_per_source",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id ASC
               ) AS rn
        FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, rn
    FROM scored WHERE rn <= 50
    """,
)
def quota_sample_per_source(spark, sf_dir):
    """Quality-first per-source quota: keep the top-50 documents of
    every source by a quality priority (here length, tie-broken by
    doc_id for determinism) — the corpus-balancing step that stops a
    giant crawl domain from drowning curated sources, applied
    greedily best-first instead of at random (contrast
    `stratified_sample_topk`, which quotas by hash order). One
    window over a (source)-partitioned sort; with quota << partition
    size Spark runs the rank behind a partial top-K per partition,
    and nothing but the surviving rows reaches the output."""
    d = load_table(spark, "documents", sf_dir)
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 50)
    )


# One shared scoring fragment evaluated by F.expr on the Spark side
# and pasted verbatim into the DuckDB oracle (identical literal text
# -> identical IEEE operation order -> bit-equal doubles pre-round).
# Add-1 smoothing over the 1024 hashed buckets on both distributions.
_DSIR_LOGRATIO = (
    "ln(((ct + 1.0) / (t_total + 1024.0)) / "
    "((cr + 1.0) / (r_total + 1024.0)))"
)


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS w
        FROM documents
    ),
    t AS (
        SELECT doc_id, source,
               ('0x' || substr(md5(w), 1, 8))::UBIGINT % 1024 AS b
        FROM toks WHERE w <> ''
    ),
    buckets AS (
        SELECT b,
               SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
               SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cr
        FROM t GROUP BY b
    ),
    totals AS (
        SELECT CAST(SUM(ct) AS DOUBLE) AS t_total,
               CAST(SUM(cr) AS DOUBLE) AS r_total
        FROM buckets
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           ROUND(SUM({_DSIR_LOGRATIO}), 6) AS dsir_logratio
    FROM t JOIN buckets USING (b) CROSS JOIN totals
    WHERE t.source <> 'src0'
    GROUP BY t.doc_id
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw-
    corpus document by the log importance ratio of a target-domain
    bag-of-hashed-ngrams model over a raw-corpus model. Here the
    target domain is `source = 'src0'` (the in-domain proxy) and the
    features are word unigrams hashed into 1024 buckets (the paper's
    hashed n-gram generative model with add-1 smoothing); a curation
    pipeline resamples the raw corpus proportionally to
    exp(dsir_logratio) to shift it toward the target distribution.

    Scale shape — the published deployment exactly: the learned model
    is the 1024-row bucket table (built in one conditional-aggregate
    pass with map-side combine, then broadcast with its two scalar
    totals), so scoring the 100 TB raw corpus is a pure map over its
    tokens plus one per-doc combinable aggregate; no join ever
    shuffles the corpus. The hash is the registry's engine-shared
    idiom (md5 first-8-hex, cf. `train_val_test_split`), and the
    log-ratio arithmetic is one shared SQL fragment
    (_DSIR_LOGRATIO) on both engines; the ~50-term double sum
    differs only in summation order (~1e-13), both sides round at
    6 dp."""
    # spread_scan: the token explode + per-token md5 is evaluated for
    # both the bucket-model pass and the scoring pass straight off the
    # scan; single-row-group input ran it all on one core (measured
    # 1.09 s of the 1.25 s wall at sf0.1). No-op at scale.
    d = spread_scan(load_table(spark, "documents", sf_dir), "doc_id")
    toks = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    t = toks.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % 1024
        ).alias("b"),
    )
    is_t = (F.col("source") == "src0").cast("long")
    buckets = t.groupBy("b").agg(
        F.sum(is_t).alias("ct"), F.sum(1 - is_t).alias("cr")
    )
    totals = buckets.agg(
        F.sum("ct").cast("double").alias("t_total"),
        F.sum("cr").cast("double").alias("r_total"),
    )
    scored = (
        t.where(F.col("source") != "src0")
        .join(F.broadcast(buckets), "b")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.round(F.sum(F.expr(_DSIR_LOGRATIO)), 6).alias("dsir_logratio"),
        )
    )
    return scored


@register(
    "interleave_mixture_schedule",
    oracle="""
    WITH w AS (
        SELECT doc_id, source,
               (CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 4) + 1 AS wt
        FROM documents
    ),
    r AS (
        SELECT doc_id, source, wt,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
        FROM w
    ),
    v AS (SELECT doc_id, source, wt, rnk * 1.0 / wt AS vtime FROM r)
    SELECT ROW_NUMBER() OVER (ORDER BY vtime, source, doc_id) AS position,
           doc_id, source, CAST(wt AS BIGINT) AS wt, ROUND(vtime, 6) AS vtime
    FROM (SELECT * FROM v ORDER BY vtime, source, doc_id LIMIT 200)
    """,
)
def interleave_mixture_schedule(spark, sf_dir):
    """Deterministic weighted source interleave (round 9): the
    training-data LOADER'S view of a mixture — given per-source
    integer weights, emit the global feed order in which a
    weight-proportional round-robin would deliver documents (stride
    scheduling: source s's r-th document runs at virtual time r/w_s;
    the schedule is the ascending vtime order with a total tiebreak).
    Mixture WEIGHTS queries (`source_mixture_weights`,
    `temperature_mixture_weights`) decide how much of each source;
    this materializes WHEN each document arrives — the reproducible
    curriculum a trainer actually consumes, here the first 200
    positions (the schedule head).

    Scale shape: per-source ranks are one partitioned window (at
    100 TB: the same per-partition-offset rank decomposition
    `deterministic_shuffle_order` documents, since per-source data is
    corpus-sized); the schedule head is TakeOrdered — top-k by vtime,
    never a global sort — and the position stamp runs over only the
    200 retained rows. Materializing the FULL schedule instead uses
    Spark's range-partitioned orderBy (range exchange + local sort),
    with positions = range-boundary offsets + local row index; vtime
    is a ratio of small integers, so both engines order identical
    doubles."""
    from pyspark.sql import Window as W

    d = load_table(spark, "documents", sf_dir)
    wt = (F.regexp_extract("source", "([0-9]+)$", 1).cast("int") % 4 + 1).alias("wt")
    r = d.select("doc_id", "source", wt).withColumn(
        "rnk", F.row_number().over(W.partitionBy("source").orderBy("doc_id"))
    )
    v = r.withColumn("vtime", F.col("rnk") * 1.0 / F.col("wt"))
    head = v.orderBy("vtime", "source", "doc_id").limit(200)
    pos = F.row_number().over(W.orderBy("vtime", "source", "doc_id"))
    return head.select(
        pos.alias("position"),
        "doc_id",
        "source",
        F.col("wt").cast("long").alias("wt"),
        F.round("vtime", 6).alias("vtime"),
    )
