"""Corpus-hygiene curation queries: deny-list scrubbing, C4-style
cross-document repeated-span removal, and a word-distribution entropy
quality signal.

These extend the LLM-training-data set past per-document stats: the
deny-list op is the bad-word policy filter every public web-corpus
pipeline runs (C4 dropped pages on a term list; masking is the softer
production variant), repeated-span removal is C4/CCNet line-level
dedup re-expressed over fixed word windows (this corpus has no
newlines), and token-distribution entropy is the repetition /
degenerate-text signal that length ratios miss.

All three are pure Catalyst expressions; the only shuffle anywhere is
the span-frequency groupBy, which keys on the span text exactly like
the inverted-index shingle groupBy in `text_q.ngram_jaccard_pairs`
(hot spans are bounded by the same document-frequency logic — a span
seen in d docs contributes d rows, never d^2 pairs, because we join
frequencies back instead of expanding pairs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions.chunking import token_windows, token_windows_sql
from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table

# Shared policy constants — baked into BOTH the Spark plan and the
# DuckDB oracle so the two sides can never drift.
_DENY_RE = r"\b(slow|big|merge)\b"
_DENY_DROP_ABOVE = 4  # > this many hits => drop the document outright
_SPAN = 5  # words per span for cross-document span dedup
_SPAN_DF = 2  # a span seen in >= this many distinct docs is boilerplate


@register(
    "denylist_scrub",
    oracle=f"""
    SELECT doc_id, source,
           CAST(n_hits AS BIGINT) AS n_hits,
           verdict,
           CASE WHEN verdict = 'mask'
                THEN regexp_replace(text, '{_DENY_RE}', '[MASKED]', 'g')
                ELSE text END AS out_text
    FROM (
      SELECT doc_id, source, text,
             LEN(regexp_extract_all(text, '{_DENY_RE}')) AS n_hits,
             CASE WHEN LEN(regexp_extract_all(text, '{_DENY_RE}')) > {_DENY_DROP_ABOVE}
                    THEN 'drop'
                  WHEN LEN(regexp_extract_all(text, '{_DENY_RE}')) > 0
                    THEN 'mask'
                  ELSE 'keep' END AS verdict
      FROM documents
    )
    """,
)
def denylist_scrub(spark, sf_dir):
    """Deny-term policy filter: count word-boundary hits of a term
    list per document, then drop heavy offenders, mask light ones,
    and pass clean docs through untouched (the C4 bad-word rule plus
    the production masking variant). Pure map over the scan — the
    regex runs identically under Java regex and DuckDB's RE2 (word
    boundaries + alternation only), and replacement is global on both
    engines."""
    d = load_table(spark, "documents", sf_dir)
    hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(_DENY_RE), F.lit(0)))
    d = d.select("doc_id", "source", "text", hits.cast("long").alias("n_hits"))
    verdict = (
        F.when(F.col("n_hits") > _DENY_DROP_ABOVE, "drop")
        .when(F.col("n_hits") > 0, "mask")
        .otherwise("keep")
    )
    d = d.withColumn("verdict", verdict)
    out = F.when(
        F.col("verdict") == "mask",
        F.regexp_replace("text", _DENY_RE, "[MASKED]"),
    ).otherwise(F.col("text"))
    return d.select("doc_id", "source", "n_hits", "verdict", out.alias("out_text"))


@register(
    "repeated_span_removal",
    oracle=f"""
    WITH spans AS (
      SELECT doc_id, w_text AS span, w_tokens AS span_tokens
      FROM ({token_windows_sql(_SPAN)})
    ),
    df AS (SELECT span, COUNT(DISTINCT doc_id) AS n_docs FROM spans GROUP BY span)
    SELECT s.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN df.n_docs >= {_SPAN_DF} THEN 1 ELSE 0 END) AS BIGINT)
             AS dropped_spans,
           CAST(SUM(CASE WHEN df.n_docs >= {_SPAN_DF} THEN 0 ELSE s.span_tokens END) AS BIGINT)
             AS kept_tokens
    FROM spans s JOIN df ON s.span = df.span
    GROUP BY s.doc_id
    """,
)
def repeated_span_removal(spark, sf_dir):
    """C4/CCNet-style cross-document span dedup: split every document
    into fixed 5-word windows, count how many DISTINCT documents each
    span occurs in, and drop spans that appear in 2+ docs
    (boilerplate); report per-document span/token yield.

    Scale shape: the span explode is a pure flatMap (`sequence` +
    `slice`, same as `doc_chunking`); span frequency is one groupBy on
    the span text with a partial-aggregated distinct count; the join
    back to spans is an equi-join on the same key, so a hot span seen
    in d docs costs d join rows — linear, never the d^2 a pair
    expansion would pay. At 100 TB the span key would be a 64-bit
    xxhash of the text (collision-safe enough for frequency counting)
    so the shuffle carries 8-byte keys; the text key here keeps the
    oracle exactly expressible."""
    d = load_table(spark, "documents", sf_dir)
    spans = token_windows(d, _SPAN).select(
        "doc_id",
        F.col("w_text").alias("span"),
        F.col("w_tokens").alias("span_tokens"),
    )
    df = spans.groupBy("span").agg(F.countDistinct("doc_id").alias("n_docs"))
    is_boiler = F.col("n_docs") >= _SPAN_DF
    return (
        spans.join(df, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(is_boiler, 1).otherwise(0)).cast("long").alias("dropped_spans"),
            F.sum(F.when(is_boiler, F.lit(0)).otherwise(F.col("span_tokens")))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


@register(
    "word_entropy_quality",
    # Bit-stable float contract: both engines fold (c/n)*ln(c/n) over
    # the SAME sorted distinct-word list left-to-right, so the double
    # sums are identical before the final round.
    oracle="""
    SELECT doc_id,
           CAST(LEN(ws) AS BIGINT) AS n_words,
           CAST(LEN(list_distinct(ws)) AS BIGINT) AS n_distinct,
           ROUND(
             -list_sum(list_transform(list_sort(list_distinct(ws)),
                x -> (CAST(LEN(list_filter(ws, w -> w = x)) AS DOUBLE) / LEN(ws))
                     * ln(CAST(LEN(list_filter(ws, w -> w = x)) AS DOUBLE) / LEN(ws))))
             / ln(2.0) + 0.0, 4) AS entropy_bits
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    """,
)
def word_entropy_quality(spark, sf_dir):
    """Shannon entropy of the per-document word distribution (bits) —
    the repetition/degenerate-text quality signal: looped or templated
    text scores far below natural prose of the same length, which the
    length and stopword-ratio rules cannot see.

    Entirely inside one projection — no explode, no shuffle: the
    distinct-word list, per-word counts, and the entropy fold are JVM
    higher-order functions over the split array (O(distinct * words)
    per row on 25-90-word docs). The fold iterates the SORTED distinct
    list so the floating-point sum is order-identical to the oracle's
    ``list_sum`` over the same sort."""
    d = load_table(spark, "documents", sf_dir)
    d = d.select("doc_id", F.split("text", " ").alias("ws"))
    # `+ 0.0` normalizes the IEEE -0.0 an all-identical-words document
    # would produce (−(1·ln 1) = −0.0) on BOTH engines before rounding
    ent = (
        "-aggregate(array_sort(array_distinct(ws)), 0.0D, (acc, x) -> acc + "
        "(CAST(size(filter(ws, w -> w = x)) AS DOUBLE) / size(ws)) "
        "* ln(CAST(size(filter(ws, w -> w = x)) AS DOUBLE) / size(ws))) / ln(2.0) + 0.0D"
    )
    return d.selectExpr(
        "doc_id",
        "CAST(size(ws) AS BIGINT) AS n_words",
        "CAST(size(array_distinct(ws)) AS BIGINT) AS n_distinct",
        f"ROUND({ent}, 4) AS entropy_bits",
    )


@register(
    "incremental_dedup_new_docs",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT md5(text) AS fp FROM documents WHERE LENGTH(source) = 4
    ),
    batch AS (
      SELECT md5(text) AS fp, doc_id, source
      FROM documents WHERE LENGTH(source) = 5
    ),
    intra AS (
      SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
             arg_min(source, doc_id) AS source
      FROM batch GROUP BY fp
    )
    SELECT i.doc_id, i.source, i.fp
    FROM intra i ANTI JOIN hist h ON i.fp = h.fp
    """,
)
def incremental_dedup_new_docs(spark, sf_dir):
    """Incremental-crawl dedup — the shape every recurring ingestion
    runs: fingerprint the NEW batch (here sources src10..src19, i.e.
    LENGTH(source)=5), dedup within the batch (keep the lowest doc_id
    per content hash), then ANTI JOIN against the fingerprints of the
    EXISTING corpus (src0..src9) so only genuinely novel documents
    survive.

    Scale shape: only 16-byte digests ever shuffle — the history side
    projects to DISTINCT fingerprints (at 100 TB that's the dedup
    index, a fraction of corpus bytes), the batch side is one scan +
    hash groupBy, and the anti join is a digest equi-join AQE can
    re-plan as broadcast whenever one side is small (a daily batch
    against a big history: broadcast the BATCH fingerprints and stream
    the history). A bloom-filter prefilter drops in ahead of the anti
    join when the history index itself is too large to shuffle."""
    d = load_table(spark, "documents", sf_dir)
    hist = (
        d.where(F.length("source") == 4)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    batch = d.where(F.length("source") == 5).select(
        F.md5("text").alias("fp"), "doc_id", "source"
    )
    intra = batch.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
    )
    return intra.join(hist, "fp", "left_anti").select("doc_id", "source", "fp")


def _frontier_keep(x: str, y: str, *parts: str):
    """Non-dominated predicate over (maximize x, maximize y) within a
    window partitioned by ``parts``: a row is dominated iff some row
    with STRICTLY larger x has y >= mine, or some row with my exact x
    has y > mine (x is integral, so 'strictly larger' is the range
    frame starting at x+1)."""
    from pyspark.sql import Window as W

    w_higher = (
        W.partitionBy(*parts).orderBy(F.col(x).asc()).rangeBetween(1, W.unboundedFollowing)
    )
    w_same = W.partitionBy(*parts, x)
    best_higher = F.max(F.col(y)).over(w_higher)
    best_same = F.max(F.col(y)).over(w_same)
    return ~(
        F.coalesce(best_higher >= F.col(y), F.lit(False)) | (best_same > F.col(y))
    )


@register(
    "pareto_frontier_curation",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             CAST(LENGTH(text) AS BIGINT) AS x,
             ROUND(LEAST(LENGTH(text) / 500.0, 1.0)
                   * ((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z ]', '', 'g')))
                      / GREATEST(LENGTH(text), 1)), 6) AS y
      FROM documents
    )
    SELECT d.doc_id, d.lang, d.x AS n_chars, d.y AS quality
    FROM s d
    WHERE NOT EXISTS (
      SELECT 1 FROM s o
      WHERE o.lang = d.lang AND o.x >= d.x AND o.y >= d.y
        AND (o.x > d.x OR o.y > d.y)
    )
    """,
)
def pareto_frontier_curation(spark, sf_dir):
    """Per-language Pareto frontier (skyline) of (length, quality) —
    the data-selection question "which documents are not strictly
    worse than some other document on both axes". The oracle is the
    textbook O(n^2) NOT-EXISTS dominance query; the Spark plan is the
    scale-safe O(n log n) two-phase form:

    1. local frontier within (lang, shard=pmod(doc_id, 16)) — a
       range-frame window per shard computes "best quality among
       strictly longer docs"; survivors are a tiny superset of the
       answer,
    2. global frontier over the survivors with the SAME predicate,
       now partitioned only by lang.

    Correct because frontier() is merge-associative: a globally
    non-dominated point is non-dominated in its own shard, so
    frontier(S) = frontier(union of per-shard frontiers). That
    identity is what lets the skyline scale — phase 1 never needs a
    global sort, phase 2 sees only candidate rows (pathological worst
    case: everything survives phase 1, e.g. already-sorted distinct
    points; then phase 2 IS the per-lang sort, same as the naive
    form — no regression, just no win)."""
    d = load_table(spark, "documents", sf_dir)
    s = d.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("x"),
        F.round(
            F.least(F.length("text") / F.lit(500.0), F.lit(1.0))
            * (
                (F.length("text") - F.length(F.regexp_replace("text", "[A-Za-z ]", "")))
                / F.greatest(F.length("text"), F.lit(1))
            ),
            6,
        ).alias("y"),
        F.pmod("doc_id", F.lit(16)).alias("_shard"),
    )
    # window predicates must be projected before the filter (Spark
    # disallows window functions in WHERE)
    local = (
        s.withColumn("_keep", _frontier_keep("x", "y", "lang", "_shard"))
        .where("_keep")
        .drop("_keep", "_shard")
    )
    return (
        local.withColumn("_keep", _frontier_keep("x", "y", "lang"))
        .where("_keep")
        .select("doc_id", "lang", F.col("x").alias("n_chars"), F.col("y").alias("quality"))
    )


@register(
    "cross_source_duplication",
    # Which sources duplicate each other: for every unordered source
    # pair (same-source duplication on the diagonal), the number of
    # NEAR-dup pairs (exact Jaccard >= 0.5 over the df-capped shingle
    # universe) whose two documents come from those sources. Exact
    # content duplication is a special case (jaccard = 1) and this
    # corpus has none below sf0.1, so the near-dup graph is the
    # non-degenerate definition at every SF.
    oracle="""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, LEN(words) - 1),
                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingles
        FROM docs WHERE LEN(words) >= 3
    ),
    ex AS (SELECT doc_id, UNNEST(shingles) AS shingle FROM sh),
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 16),
    kept AS (SELECT e.doc_id, e.shingle FROM ex e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    nd AS (
        SELECT doc_a, doc_b FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
    )
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_neardup_pairs
    FROM nd JOIN documents da ON nd.doc_a = da.doc_id
            JOIN documents db ON nd.doc_b = db.doc_id
    GROUP BY 1, 2
    """,
)
def cross_source_duplication(spark, sf_dir):
    """Cross-source duplication matrix: near-dup pair counts per
    unordered source pair — the audit that decides which crawl feeds
    mirror each other and which deserve their own mixture weight.
    Shape: the capped-inverted-index pair backbone (shared with
    ngram_jaccard_pairs); the (doc_id, source) lookup is semi-
    filtered to pair MEMBERS before it is broadcast — the near-dup
    pair set is orders of magnitude smaller than the corpus, so the
    broadcast is bounded by the dedup yield, not the corpus size.
    Only ids and source labels shuffle, never text."""
    from wnv_etl_lab2_spark.queries.text_q import _capped_pair_counts

    jac = F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    nd = _capped_pair_counts(spark, sf_dir, jaccard_floor=0.5).where(jac >= 0.5).select("da", "db")
    nd = nd.localCheckpoint(eager=False)  # feeds the id filter + both joins
    ids = nd.select(F.explode(F.array("da", "db")).alias("doc_id")).distinct()
    d = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "source")
        .join(F.broadcast(ids), "doc_id", "left_semi")
    )
    sa = d.select(F.col("doc_id").alias("da"), F.col("source").alias("_sa"))
    sb = d.select(F.col("doc_id").alias("db"), F.col("source").alias("_sb"))
    return (
        nd.join(F.broadcast(sa), "da")
        .join(F.broadcast(sb), "db")
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_neardup_pairs"))
    )


@register(
    "temperature_mixture_weights",
    # Temperature-scaled source sampling weights (the GPT-3/PaLM
    # mixture trick): w_s ∝ n_s^(1/T) with T = 2 flattens the natural
    # distribution toward small sources. POW over doubles is IEEE-
    # identical across engines for these magnitudes after ROUND 6.
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    t AS (SELECT SUM(n) AS tot, SUM(POW(n, 0.5)) AS scaled_tot FROM c)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           ROUND(n * 1.0 / tot, 6) AS natural_share,
           ROUND(POW(n, 0.5) / scaled_tot, 6) AS t2_share,
           ROUND((POW(n, 0.5) / scaled_tot) / (n * 1.0 / tot), 6) AS boost
    FROM c CROSS JOIN t
    """,
)
def temperature_mixture_weights(spark, sf_dir):
    """Temperature-scaled mixture weights per source: natural share,
    T=2 share (w ∝ n^(1/2)), and the resulting up/down-sampling boost
    — the knob that keeps small high-quality sources from being
    drowned by bulk crawl at pre-training time. One count per source
    plus a broadcast scalar join; pairs with `mixture_resample`, which
    turns these weights into deterministic per-doc copy counts."""
    d = load_table(spark, "documents", sf_dir)
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").alias("tot"), F.sum(F.pow("n", 0.5)).alias("scaled_tot")
    )
    return c.crossJoin(F.broadcast(t)).select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.col("n") * 1.0 / F.col("tot"), 6).alias("natural_share"),
        F.round(F.pow("n", 0.5) / F.col("scaled_tot"), 6).alias("t2_share"),
        F.round(
            (F.pow("n", 0.5) / F.col("scaled_tot")) / (F.col("n") * 1.0 / F.col("tot")),
            6,
        ).alias("boost"),
    )


@register(
    "corpus_dashboard",
    # One-row corpus overview: the numbers a data lead reads first.
    # Every statistic is a combinable aggregate over one scan (plus
    # the digest distinct for the exact-dup rate); mixture entropy is
    # the per-source share entropy folded over the sorted source list
    # so the double sum is order-identical across engines.
    oracle="""
    WITH base AS (
      SELECT doc_id, source, lang, md5(text) AS digest,
             CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique_texts,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM base
    ),
    shares AS (
      SELECT source, COUNT(*) * 1.0 AS c FROM base GROUP BY source
    ),
    ent AS (
      SELECT ROUND(-list_sum(list_transform(
               list_sort(list(c / (SELECT n_docs FROM tot))),
               p -> p * ln(p))) / ln(2.0), 6) AS mixture_entropy_bits
      FROM shares
    )
    SELECT n_docs, n_tokens, n_unique_texts,
           ROUND((n_docs - n_unique_texts) * 1.0 / n_docs, 6) AS exact_dup_rate,
           n_sources, n_langs, mixture_entropy_bits
    FROM tot CROSS JOIN ent
    """,
)
def corpus_dashboard(spark, sf_dir):
    """One-row corpus overview: docs, tokens, unique texts and the
    exact-duplication rate (content digest), source/lang cardinality,
    and the source-mixture entropy in bits (how evenly the corpus
    spreads over its sources — the number temperature sampling
    moves). One scan of combinable aggregates; the entropy folds over
    the SORTED per-source shares so the float sum matches the oracle
    bit-for-bit. The capstone read-out over the curation family."""
    d = load_table(spark, "documents", sf_dir)
    base = d.select(
        "source",
        "lang",
        F.md5("text").alias("digest"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    base = base.localCheckpoint(eager=False)  # feeds totals + shares
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("digest").cast("long").alias("n_unique_texts"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    shares = base.groupBy("source").agg((F.count(F.lit(1)) * 1.0).alias("c"))
    ent = (
        shares.crossJoin(F.broadcast(tot.select("n_docs")))
        .agg(F.sort_array(F.collect_list(F.col("c") / F.col("n_docs"))).alias("ps"))
        .select(
            F.round(
                -F.expr(
                    "aggregate(ps, CAST(0.0 AS DOUBLE), (a, p) -> a + p * ln(p))"
                )
                / F.log(F.lit(2.0)),
                6,
            ).alias("mixture_entropy_bits")
        )
    )
    return tot.crossJoin(F.broadcast(ent)).select(
        "n_docs",
        "n_tokens",
        "n_unique_texts",
        F.round(
            (F.col("n_docs") - F.col("n_unique_texts")) * 1.0 / F.col("n_docs"), 6
        ).alias("exact_dup_rate"),
        "n_sources",
        "n_langs",
        "mixture_entropy_bits",
    )


@register(
    "chunk_dedup_stats",
    # Chunk-granularity exact duplication: documents are cut into the
    # same 32-token windows doc_chunking emits, chunks are grouped by
    # md5 digest, and the per-source duplication rate reported — the
    # metric behind chunk-level dedup decisions (a doc can be unique
    # while half its chunks are boilerplate).
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, w_text FROM ({token_windows_sql(32)})
    ),
    j AS (
      SELECT d.source, md5(c.w_text) AS digest
      FROM chunks c JOIN documents d USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique_chunks,
           ROUND((COUNT(*) - COUNT(DISTINCT digest)) * 1.0 / COUNT(*), 6)
             AS chunk_dup_rate
    FROM j GROUP BY source
    """,
)
def chunk_dedup_stats(spark, sf_dir):
    """Chunk-level exact-duplication rate per source over the same
    32-token windows `doc_chunking` emits: a document can be globally
    unique while half its chunks are boilerplate, and chunk-level
    dedup is what catches it. Pure flatMap explode -> digest groupBy
    (16-byte keys); the source join is a broadcast of the tiny
    (doc_id, source) projection relative to the chunk explosion."""
    from wnv_etl_lab2_spark.functions.chunking import token_windows

    d = load_table(spark, "documents", sf_dir)
    chunks = token_windows(d, 32).select("doc_id", F.md5("w_text").alias("digest"))
    src = d.select("doc_id", "source")
    j = chunks.join(src, "doc_id")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.countDistinct("digest").cast("long").alias("n_unique_chunks"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("digest"))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("chunk_dup_rate"),
    )


# PII scrub fixture: the synthetic tables carry no organic PII, so the
# query CONSTRUCTS a deterministic contact string from customer keys —
# the same backslash-free SQL fragment on both engines — and then runs
# the real detection/masking machinery (functions/pii.py) over it.
# The operator under test is the scrub; the fixture column just makes
# every rule provably fire (3/4 of rows carry exactly one PII form).
_CONTACT_SQL = (
    "CASE c_custkey % 4 "
    "WHEN 0 THEN 'reach user' || CAST(c_custkey AS STRING) || "
    "'@mail.example.com for details' "
    "WHEN 1 THEN 'call 555-' || lpad(CAST(c_custkey % 1000 AS STRING), 3, '0') "
    "|| '-' || lpad(CAST(c_custkey % 10000 AS STRING), 4, '0') || ' after hours' "
    "WHEN 2 THEN 'host 10.' || CAST(c_custkey % 256 AS STRING) || '.' || "
    "CAST((c_custkey * 7) % 256 AS STRING) || '.' || "
    "CAST(c_custkey % 254 + 1 AS STRING) || ' logged' "
    "ELSE 'no contact on file' END"
)


def _pii_oracle() -> str:
    from wnv_etl_lab2_spark.functions.pii import PII_RULES, pii_scrub_sql

    counts = ", ".join(
        f"CAST(LEN(regexp_extract_all(contact, '{pat}', 0)) AS BIGINT) AS n_{name}s"
        for name, pat, _ in PII_RULES
    )
    return f"""
    WITH c AS (SELECT c_custkey, {_CONTACT_SQL} AS contact FROM customer)
    SELECT c_custkey, {pii_scrub_sql('contact')} AS contact_masked, {counts}
    FROM c
    """


@register("pii_scrub", oracle=_pii_oracle())
def pii_scrub(spark, sf_dir):
    """PII detection + redaction (the C4/Dolma scrub stage): per-row
    match counts for email/phone/IPv4 patterns plus the globally
    masked text with typed placeholders. Pure map over the scan —
    regexp evaluation is JVM-side codegen, no shuffle at any corpus
    size; at 100 TB this runs as a projection fused into the read
    stage. Patterns live in functions/pii.py, written backslash-free
    so Spark and DuckDB read the identical spelling, group-free with
    explicit group 0 (the engines disagree on the default group)."""
    from wnv_etl_lab2_spark.functions.pii import pii_counts, pii_scrub_col

    c = load_table(spark, "customer", sf_dir)
    return c.withColumn("contact", F.expr(_CONTACT_SQL)).select(
        "c_custkey",
        pii_scrub_col("contact").alias("contact_masked"),
        *pii_counts("contact"),
    )


@register(
    "dup_cluster_histogram",
    oracle="""
    WITH g AS (SELECT md5(text) AS h, COUNT(*) AS csize
               FROM documents GROUP BY md5(text))
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(csize * COUNT(*) AS BIGINT) AS n_docs,
           CAST((csize - 1) * COUNT(*) AS BIGINT) AS n_removable
    FROM g GROUP BY csize
    """,
)
def dup_cluster_histogram(spark, sf_dir):
    """Distribution of exact-duplicate cluster sizes: how many
    content clusters have k copies, how many docs that is, and how
    many a keep-one policy would remove — the read-out that tells you
    whether duplication is a long tail of pairs or a few monster
    boilerplate clusters (which decides salting and df-cap settings
    before a 100 TB dedup run). Two digest-keyed aggregations; the
    second groups ~distinct-count rows by an int — both map-side
    combinable, nothing but (digest, count) pairs ever shuffles."""
    d = load_table(spark, "documents", sf_dir)
    g = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("csize")
    )
    return (
        g.groupBy(F.col("csize").cast("long").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("long")
            .alias("n_removable"),
        )
    )


@register(
    "source_quantile_normalize",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               ROUND(LEN(list_distinct(string_split(text, ' '))) * 1.0
                     / LEN(string_split(text, ' ')), 6) AS qscore
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, qscore,
               PERCENT_RANK() OVER (
                   PARTITION BY source ORDER BY qscore ASC, doc_id ASC
               ) AS src_pct
        FROM scored
    )
    SELECT doc_id, source, qscore, ROUND(src_pct, 6) AS src_pct
    FROM ranked WHERE src_pct >= 0.5
    """,
)
def source_quantile_normalize(spark, sf_dir):
    """Cross-source quality-score calibration (round 8): raw quality
    scores are not comparable across sources (a mid-quality crawl page
    and a mid-quality academic page score differently), so curation
    pipelines normalize per-source BEFORE applying a global keep
    threshold — here each document's type-token ratio is converted to
    its within-source percent rank and the global policy keeps the top
    half of every source. Ranking runs on the ROUNDED score with a
    doc_id tiebreak so the total order (and hence every rank) is
    bit-identical on both engines; percent_rank = (pos-1)/(n-1) is the
    same exact integer division either way.

    Scale shape: the score is a pure map over the scan; the window
    shuffles once on source. Source cardinality is small, so at 100 TB
    the per-source sort is the hazard — the production path
    (`curation.source_quantile_keep`, r9) replaces exact percent_rank
    with per-source approx-quantile boundaries: combinable KLL sketch,
    |sources|-row broadcast, map-side keep test fused into the scan —
    no total order ever materialized. Its keep set is pinned to >= 99%
    agreement with this exact form (tests/test_calibration.py); the
    exact window form here is the oracle-checkable semantics of that
    rollout."""
    d = load_table(spark, "documents", sf_dir)
    from pyspark.sql import Window as W

    scored = d.select(
        "doc_id",
        "source",
        F.round(
            F.size(F.array_distinct(F.split("text", " ")))
            * 1.0
            / F.size(F.split("text", " ")),
            6,
        ).alias("qscore"),
    )
    w = W.partitionBy("source").orderBy(F.col("qscore").asc(), F.col("doc_id").asc())
    ranked = scored.withColumn("src_pct", F.percent_rank().over(w))
    return ranked.where(F.col("src_pct") >= 0.5).select(
        "doc_id", "source", "qscore", F.round("src_pct", 6).alias("src_pct")
    )


def _ablation_oracle() -> str:
    from wnv_etl_lab2_spark.functions.quality import rule_pass_sqls

    sqls = rule_pass_sqls("text")
    names = list(sqls)
    flags = ", ".join(f"({sql}) AS p_{n}" for n, sql in sqls.items())
    per_rule = []
    for n in names:
        others = " AND ".join(f"p_{o}" for o in names if o != n)
        per_rule.append(
            f"SELECT '{n}' AS rule, "
            f"SUM(CASE WHEN NOT p_{n} THEN 1 ELSE 0 END) AS n_fail, "
            f"SUM(CASE WHEN NOT p_{n} AND {others} THEN 1 ELSE 0 END) AS n_fail_only, "
            f"COUNT(*) AS n_docs FROM f"
        )
    union = " UNION ALL ".join(per_rule)
    return f"""
    WITH f AS (SELECT {flags} FROM documents),
    u AS ({union})
    SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
           CAST(n_fail_only AS BIGINT) AS n_fail_only,
           ROUND(n_fail_only * 1.0 / n_docs, 6) AS marginal_share
    FROM u
    """


@register("quality_rule_ablation", oracle=_ablation_oracle())
def quality_rule_ablation(spark, sf_dir):
    """Quality-rule ablation sheet (round 9): for every rule in the
    shared Gopher-style policy (`functions/quality.py`), how many
    documents fail it, and how many fail ONLY it — the marginal
    removal each rule is solely responsible for. This is the sheet a
    curation owner reads before tightening or dropping a rule: a rule
    with large n_fail but near-zero n_fail_only is redundant with the
    rest of the policy, while a large n_fail_only means the rule alone
    is carrying that cut. The rule set is read from the SAME module
    the executable pipeline filters with, so the audit can never drift
    from the filter.

    Scale shape: per-rule pass booleans are a pure map fused into the
    scan; ONE combinable constant-width aggregation (2 counters per
    rule + a total) reduces the corpus to a single row, unpivoted
    driver-free via stack() into |rules| rows — at 100 TB exactly one
    one-row exchange."""
    from wnv_etl_lab2_spark.functions.quality import rule_pass_columns

    d = load_table(spark, "documents", sf_dir)
    rules = rule_pass_columns("text")
    names = list(rules)
    flagged = d.select(
        *[c.alias(f"p_{n}") for n, c in rules.items()]
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for n in names:
        others = None
        for o in names:
            if o == n:
                continue
            others = F.col(f"p_{o}") if others is None else (others & F.col(f"p_{o}"))
        aggs.append(
            F.sum((~F.col(f"p_{n}")).cast("long")).alias(f"fail_{n}")
        )
        aggs.append(
            F.sum((~F.col(f"p_{n}") & others).cast("long")).alias(f"only_{n}")
        )
    one = flagged.agg(*aggs)
    stack = ", ".join(f"'{n}', fail_{n}, only_{n}" for n in names)
    return one.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_fail, n_fail_only)",
        "n_docs",
    ).select(
        "rule",
        "n_fail",
        "n_fail_only",
        F.round(F.col("n_fail_only") * 1.0 / F.col("n_docs"), 6).alias(
            "marginal_share"
        ),
    )


@register(
    "source_similarity_matrix",
    # Pairwise TF-IDF cosine between SOURCES (sklearn-smoothed idf:
    # ln((1+S)/(1+df)) + 1, raw-count tf). The word-keyed pair join
    # emits at most vocab x S^2 rows (S = #sources), never a
    # document pair — the redundancy audit stays metadata-sized no
    # matter the corpus.
    oracle="""
    WITH words AS (
      SELECT source, u.w AS w
      FROM documents, LATERAL (SELECT UNNEST(string_split(text, ' ')) AS w) AS u
      WHERE u.w <> ''
    ),
    tf AS (SELECT source, w, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM words GROUP BY source, w),
    s AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS ns FROM tf),
    dfreq AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY w),
    v AS (
      SELECT tf.source, tf.w,
             tf.tf * (LN((1 + s.ns) / (1 + d.df)) + 1) AS x
      FROM tf JOIN dfreq d USING (w) CROSS JOIN s
    ),
    nrm AS (SELECT source, SQRT(SUM(x * x)) AS nm FROM v GROUP BY source),
    dots AS (
      SELECT a.source AS src_a, b.source AS src_b, SUM(a.x * b.x) AS dp
      FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT d.src_a, d.src_b,
           ROUND(d.dp / (na.nm * nb.nm), 6) AS cosine_tfidf
    FROM dots d
    JOIN nrm na ON na.source = d.src_a
    JOIN nrm nb ON nb.source = d.src_b
    """,
)
def source_similarity_matrix(spark, sf_dir):
    """Which sources are REDUNDANT with each other: cosine similarity
    between per-source TF-IDF unigram vectors, one row per unordered
    source pair. This is the mixture-design audit that precedes
    source weighting (two near-identical crawls should not both get
    full weight) — the source-level complement of the document-level
    dedup family. Scale shape: tf is one (source, word) groupBy; the
    pair join keys on WORD so it emits at most vocab x S^2 rows; no
    document pair, no document text, ever leaves the first
    aggregation."""
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    # Materialize tf: five downstream branches (dfreq, ns, v x2, nrm)
    # would otherwise each re-derive it with different column pruning,
    # defeating ReusedExchange and re-scanning the corpus per branch
    # (measured: 27 scans without the checkpoint, 1 with). The
    # materialized frame is vocab x S rows — distributed on executors,
    # metadata-sized relative to any corpus.
    tf = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    ).localCheckpoint()
    ns = tf.select(F.countDistinct("source").cast("double").alias("ns"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("df"))
    v = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "w",
            (
                F.col("tf")
                * (F.log((1 + F.col("ns")) / (1 + F.col("df"))) + 1)
            ).alias("x"),
        )
    )
    nrm = v.groupBy("source").agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nm"))
    a, b = v.alias("a"), v.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("dp"))
    )
    na = nrm.select(F.col("source").alias("src_a"), F.col("nm").alias("na"))
    nb = nrm.select(F.col("source").alias("src_b"), F.col("nm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a", "src_b",
            F.round(F.col("dp") / (F.col("na") * F.col("nb")), 6).alias("cosine_tfidf"),
        )
    )


@register(
    "ks_drift_sources",
    oracle="""
    WITH per AS (
        SELECT n_chars,
               SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c1
        FROM documents
        WHERE source IN ('src0', 'src1')
        GROUP BY n_chars
    ),
    cum AS (
        SELECT SUM(c0) OVER (ORDER BY n_chars) AS k0,
               SUM(c1) OVER (ORDER BY n_chars) AS k1,
               SUM(c0) OVER () AS n0,
               SUM(c1) OVER () AS n1
        FROM per
    )
    SELECT ROUND(MAX(ABS(k0 / n0 - k1 / n1)), 6) AS ks_stat,
           CAST(MAX(n0) AS BIGINT) AS n_src0,
           CAST(MAX(n1) AS BIGINT) AS n_src1
    FROM cum
    """,
)
def ks_drift_sources(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift statistic between two
    sources' document-length distributions (round 11) — the
    distribution-shift gate a training-data pipeline runs when a
    crawl's new slice must match the slice it replaces: KS = the max
    vertical gap between the two empirical CDFs, computed EXACTLY by
    grouping to distinct lengths first (counts per source per value),
    then one cumulative window over the distinct values — the exact
    statistic without ever sorting raw rows.

    Scale shape: the only row-scale work is the groupBy(n_chars)
    (combinable counts); the window runs over DISTINCT values, whose
    cardinality is bounded by the value domain (here <= ~2k lengths
    at any SF), so the single-partition window frame is a bounded
    artifact, not a corpus sort — at 100 TB you'd bin values first
    and this plan is unchanged. Integer counts + one final division
    make the statistic bit-exact across engines."""
    from pyspark.sql import Window as W

    d = (
        load_table(spark, "documents", sf_dir)
        .where(F.col("source").isin("src0", "src1"))
        .groupBy("n_chars")
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("c1"),
        )
    )
    wc = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    wt = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = d.select(
        F.sum("c0").over(wc).alias("k0"),
        F.sum("c1").over(wc).alias("k1"),
        F.sum("c0").over(wt).alias("n0"),
        F.sum("c1").over(wt).alias("n1"),
    )
    return cum.agg(
        F.round(F.max(F.abs(F.col("k0") / F.col("n0") - F.col("k1") / F.col("n1"))), 6).alias(
            "ks_stat"
        ),
        F.max("n0").cast("long").alias("n_src0"),
        F.max("n1").cast("long").alias("n_src1"),
    )


@register(
    "gini_source_concentration",
    oracle="""
    WITH mass AS (
        SELECT source, SUM(n_chars) AS m
        FROM documents
        GROUP BY source
    ),
    ranked AS (
        SELECT m,
               ROW_NUMBER() OVER (ORDER BY m ASC, source ASC) AS i,
               COUNT(*) OVER () AS s,
               SUM(m) OVER () AS tot
        FROM mass
    )
    SELECT ROUND(2.0 * SUM(i * m) / (s * tot) - (s + 1.0) / s, 6) AS gini,
           CAST(MAX(s) AS BIGINT) AS n_sources
    FROM ranked
    GROUP BY s, tot
    """,
)
def gini_source_concentration(spark, sf_dir):
    """Gini coefficient of corpus mass (total chars) across sources
    (round 11) — the mixture-concentration audit: 0 = every source
    contributes equally, ->1 = one source dominates; the number a
    data-mixture owner tracks so one crawl cannot silently become the
    corpus. Exact rank formula G = 2*sum(i*m_i)/(S*sum(m)) - (S+1)/S
    over sources ranked by mass ascending (source-name tie-break for
    determinism).

    Scale shape: one combinable SUM per source (the only row-scale
    work), then rank/sums over the |sources|-row table — a bounded
    artifact at any corpus size. Integer masses keep the ranks and
    sums engine-exact; the one float division is the final
    expression, rounded identically on both sides."""
    from pyspark.sql import Window as W

    mass = (
        load_table(spark, "documents", sf_dir)
        .groupBy("source")
        .agg(F.sum("n_chars").alias("m"))
    )
    ranked = mass.select(
        "m",
        F.row_number().over(W.orderBy(F.col("m").asc(), F.col("source").asc())).alias("i"),
        F.count(F.lit(1)).over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("s"),
        F.sum("m").over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).alias("tot"),
    )
    return ranked.groupBy("s", "tot").agg(
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("m")) / (F.col("s") * F.col("tot"))
            - (F.col("s") + F.lit(1.0)) / F.col("s"),
            6,
        ).alias("gini"),
        F.max("s").cast("long").alias("n_sources"),
    ).drop("s", "tot")
