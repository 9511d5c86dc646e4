"""Text-analysis + dedup queries over the `documents` table.

The LLM-training-data-pipeline operator set (BASELINE.json north star):
text stats / quality scoring, token counting, language-ID heuristic,
document fingerprinting, exact dedup, and n-gram Jaccard near-dedup.
Everything here is built-in Catalyst expressions (split/regexp/md5/
explode) — no Python in the hot path; the near-dup pair join is an
equi-join on shingle (never a cross join), the same
bucket-then-verify shape MinHash LSH uses at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table, spread_scan


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS char_len,
           LEN(string_split(text, ' ')) AS word_cnt,
           regexp_matches(text, '[0-9]') AS has_digit,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces
    FROM documents
    """,
)
def text_stats(spark, sf_dir):
    """Per-document quality stats: char length, word count, digit
    presence, space count — the length/punctuation feature family."""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("char_len"),
        F.size(F.split("text", " ")).cast("long").alias("word_cnt"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))).cast("long").alias(
            "n_spaces"
        ),
    )


@register(
    "token_count",
    oracle="""
    SELECT source,
           CAST(SUM(LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+'))) AS BIGINT) AS total_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY source
    """,
)
def token_count(spark, sf_dir):
    """Token counting with a BPE-ish regex tokenizer (alnum runs),
    aggregated per source — the corpus-sizing query."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)))
    return d.groupBy("source").agg(
        F.sum(toks.cast("long")).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "lang_id_heuristic",
    oracle="""
    SELECT doc_id, lang,
           LEN(regexp_extract_all(LOWER(text), '\\b(the|a|of|and|is)\\b')) AS en_hits,
           LEN(regexp_extract_all(LOWER(text), '\\b(el|la|de|los|es)\\b')) AS es_hits,
           CASE WHEN LEN(regexp_extract_all(LOWER(text), '\\b(the|a|of|and|is)\\b'))
                     >= LEN(regexp_extract_all(LOWER(text), '\\b(el|la|de|los|es)\\b'))
                THEN 'en' ELSE 'es' END AS predicted_lang
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def lang_id_heuristic(spark, sf_dir):
    """Language-ID via stopword-hit counting (n-gram heuristic family).
    Word-boundary regex runs identically under Java regex and RE2."""
    d = load_table(spark, "documents", sf_dir).where(F.col("doc_id") % 5 == 0)
    en = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\b(the|a|of|and|is)\b"), F.lit(0)))
    es = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\b(el|la|de|los|es)\b"), F.lit(0)))
    return d.select(
        "doc_id",
        "lang",
        en.cast("long").alias("en_hits"),
        es.cast("long").alias("es_hits"),
        F.when(en >= es, "en").otherwise("es").alias("predicted_lang"),
    )


@register(
    "lang_quality_agg",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def lang_quality_agg(spark, sf_dir):
    """Corpus quality profile per language."""
    d = load_table(spark, "documents", sf_dir)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_quality_pandas_udf",
    # The pandas kernel is plain float arithmetic over character
    # counts, so DuckDB can recompute it exactly (verified bit-equal
    # at sf0.001/0.01/0.1): length saturation x alpha-density, same
    # operation order as the kernel so the doubles agree pre-round.
    oracle="""
    SELECT doc_id,
           ROUND(LEAST(LENGTH(text) / 500.0, 1.0)
                 * ((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z ]', '', 'g')))
                    / GREATEST(LENGTH(text), 1)), 6) AS quality
    FROM documents
    """,
)
def text_quality_pandas_udf(spark, sf_dir):
    """Vectorized quality scoring through the Arrow pandas-UDF path
    (functions/udfs.py) — the sanctioned slow-path surface, kept out
    of every other hot query on purpose. The kernel math is checked
    directly in test_udfs.py and cross-engine via the oracle."""
    from wnv_etl_lab2_spark.functions.udfs import with_quality_score

    d = load_table(spark, "documents", sf_dir)
    return with_quality_score(d).select(
        "doc_id", F.round("quality", 6).alias("quality")
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, keep lowest doc_id.
    One shuffle on the hash; at 100 TB the hash (32 bytes) shuffles,
    never the document bodies."""
    d = load_table(spark, "documents", sf_dir)
    return (
        d.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@register(
    "dedup_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'),
                                       ' +', ' ', 'g'))) AS fingerprint
        FROM documents
    )
    SELECT fingerprint, CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM fp
    GROUP BY fingerprint
    """,
)
def dedup_fingerprint(spark, sf_dir):
    """Normalized-content fingerprint dedup: lowercase, strip
    non-alnum, collapse spaces, hash — catches trivially-reformatted
    duplicates that exact hashing misses."""
    d = load_table(spark, "documents", sf_dir)
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " ")
    )
    return (
        d.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# Document-frequency cap: shingles appearing in more than this many
# documents are stop-shingles — dropped from the universe BEFORE set
# sizes and intersections (standard stop-shingle removal). A shingle at
# df=d would emit d(d-1)/2 pairs from its inverted-index group; the cap
# bounds every group at K(K-1)/2, which is what keeps the exact path
# alive at corpus scale. Chosen to bite on this corpus (drops ~670
# shingles at sf0.1) without changing the qualifying pair set.
_DF_CAP = 16



def _capped_pair_counts(
    spark, sf_dir, jaccard_floor: float | None = None,
    containment_floor: float | None = None,
):
    """Shared backbone of the exact near-dup metrics
    (`ngram_jaccard_pairs`, `containment_pairs`,
    `neardup_threshold_sweep`): (da, db, inter, na, nb) for every
    document pair that can reach the caller's similarity floor, over
    the df-capped hashed word-3-gram shingle universe. Exactly one of
    ``jaccard_floor`` / ``containment_floor`` must be given; the
    returned pair set is a SUPERSET of the pairs meeting that floor
    (callers re-filter on the exact metric) and inter/na/nb are exact
    over the capped universe, so caller outputs match the inverted-
    index oracles bit-for-bit.

    Shape (the round-6 rebuild — the previous form shuffled every
    posting into an inverted index and then every co-occurrence row
    into a pair count: 15.8 MB ≈ 95% of the sf0.1 corpus, flagged in
    MEASUREMENTS.md):

    1. EXACT stop-shingle set: shingle-only count aggregate (map-side
       partial agg — the shuffle carries (shingle, partial_count)
       rows, never doc ids) -> df > cap -> one broadcast array. The
       cap is part of the query semantics, so this pass is the
       irreducible exact-df floor. At production cap values the stop
       set is the Zipf head of the shingle vocabulary (df above a
       corpus-proportional cap) — ~10^6-10^7 longs at 100 TB, a
       normal-sized broadcast; swap for a bloom-filter semi-join if a
       corpus ever breaks that.
    2. Per-doc CAPPED sorted array `_shc` = array_sort(array_except
       (shingles, stop)) — a pure map, so set sizes (na/nb) are
       size(_shc) with NO per-doc aggregation shuffle (the old
       backbone paid a second posting-sized groupBy for them).
    3. PREFIX-FILTERED candidates (AllPairs/PPJoin prefix lemma,
       Bayardo et al., WWW'07): under a global token order, a pair at
       jaccard >= t must share its globally-smallest common token
       within the first n - ceil(t*n) + 1 tokens of BOTH sorted sets
       (the smallest common token leaves >= ceil(t*n) common tokens
       at-or-after it in each set). So only each doc's PREFIX posts
       into the candidate index — ~(1-t) of the postings — and the
       in-bucket pair expansion runs over prefix buckets only. For a
       containment floor (inter >= t*min(na, nb)) the lemma binds
       only the SMALLER side, so prefixes join against FULL postings
       instead. The floor+1e-6 guard rounds the prefix length UP
       under float error — a longer prefix can only add candidates,
       never lose one.
    4. Exact verify: candidate ids semi-filter `_shc`, one join per
       side, inter = size(array_intersect) — candidates only, never
       the corpus.

    RECORDED TRADE-OFF (round-6 verdict #3, settled round 7): the
    prefix filter costs ~+10% local wall (the slice/posexplode pass;
    sf0.1 bench ~1.6-1.7 s vs ~1.5 s for full postings) and buys a
    2.2x smaller posting shuffle (95% -> 44%/42% of the corpus,
    MEASUREMENTS.md) — at cluster scale the shuffle is the binding
    resource, so the filter stays. SCALE_SMOKE.md carries the
    replication curve: per-unit x16 cost 0.32/0.36 against a declared
    gate of 1.0 (enforced by tools/scale_smoke.py), with the x16
    growth shown to be OUTPUT-shaped (k^2 qualifying pairs per
    replicated near-dup cluster), not candidate explosion — the df
    cap bounds in-bucket work at cap^2 per shingle.

    Every bucket is <= cap deep by construction (stop shingles are
    gone before posting), so no silent bucket drop exists anywhere.
    Shingles are hashed to longs inside the lambda (see
    operators/dedup.hashed_word_shingles): the 30-byte strings never
    materialize, xxhash64 collisions (~2^-40) are negligible, and the
    numeric order is the global total order the prefix lemma needs.
    The synthetic corpus arrives as one small parquet split; at real
    scale the scan is already parallel, so the explicit spread of the
    shingle stage is harmless there and necessary here."""
    d = load_table(spark, "documents", sf_dir)
    return exact_pair_counts(
        d, jaccard_floor=jaccard_floor, containment_floor=containment_floor
    )


def exact_pair_counts(
    d, jaccard_floor: float | None = None, containment_floor: float | None = None
):
    """DataFrame-parameterized body of `_capped_pair_counts` (needs
    ``doc_id``, ``text``) — exposed so tools/scale_smoke.py can drive
    the backbone on replicated corpora; semantics documented above."""
    from wnv_etl_lab2_spark.operators.dedup import pair_explode, shingle_expr

    assert (jaccard_floor is None) != (containment_floor is None)
    floor = jaccard_floor if jaccard_floor is not None else containment_floor
    spark = d.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # spread ONLY when the scan has fewer splits than the shuffle
    # parallelism (the single-file test parquet): at real scale the
    # scan is already parallel and this staging exchange vanishes —
    # same conditional winnow_fingerprints uses. Locally it fires, and
    # MEASUREMENTS.md counts it as the staging line it is. The spread
    # moves the RAW (doc_id, text) projection — repartitioning after
    # the split would ship the word arrays, measured ~2.5x the bytes.
    base = d.select("doc_id", "text")
    if d.rdd.getNumPartitions() < nparts:
        base = base.repartition(nparts, "doc_id")
    docs = base.select("doc_id", F.split("text", " ").alias("words")).where(
        F.size("words") >= 3
    )
    # The shingle arrays are computed ONCE and materialized: the exact
    # df pass and the capped-array build both consume them, and
    # without the checkpoint the scan+split+shingle pipeline runs once
    # per consumer (measured +0.5 s and a much noisier wall). At
    # 100 TB this caches a corpus-sized (id, shingle-array) frame to
    # executor memory/disk; the alternative — recompute from a second
    # scan — trades that storage for one more full scan pass, a knob
    # a cluster deployment can flip by dropping the checkpoint. Note
    # the explode takes `_sh` as a stored ATTRIBUTE of the checkpoint,
    # which is exactly what makes it safe: exploding a computed array
    # expression through a projection lets InferFiltersFromGenerate +
    # pushdown inline the whole transform into the scan filter
    # (measured 3 evaluations per row, ~9x the map cost — the hazard
    # shingle_expr documents).
    sh = docs.selectExpr(
        "doc_id", f"{shingle_expr('words')} AS _sh"
    ).localCheckpoint(eager=False)
    # Stop-shingle detection: one exact df pass over the shingle
    # universe. This exchange is irreducible for EXACT cap semantics —
    # a shingle seen once in each of cap+1 partitions is locally
    # indistinguishable from a df=1 singleton, so every distinct
    # shingle must be communicated at least once (deterministic
    # heavy-hitter lower bound). Keying by xxhash64 instead of the
    # string was measured a WASH (r8): the shuffle codec already
    # compresses word-shingle strings to hash-sized records, so the
    # byte cut comes from the codec (zstd, session.py), not the key.
    stop = (
        sh.select(F.explode("_sh").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > _DF_CAP)
        .agg(F.sort_array(F.collect_list("shingle")).alias("_stop"))
    )
    # The capped-array frame feeds the prefix postings, [full
    # postings], and both verify joins; its own materialization point
    # keeps the except+sort from re-running per consumer. No
    # size(_shc) filter: an empty capped array explodes to no postings
    # and can never be a candidate.
    shc = (
        sh.crossJoin(F.broadcast(stop))
        .selectExpr("doc_id", "array_sort(array_except(_sh, _stop)) AS _shc")
        .localCheckpoint(eager=False)
    )
    # Postings are ONE packed long: doc*2^21 + fits*2^20 + n*2^10 +
    # pos (pos 1-based within the sorted capped array; `fits` set when
    # n < 1024 so both 10-bit fields are exact). Packing keeps the
    # posting row at (shingle, long) — same shuffle bytes as a bare
    # doc id — while carrying what the PPJoin positional filters below
    # need at pair-emission time. Oversized ARRAYS (n >= 1024) drop
    # `fits` and are emitted UNconditionally — the filters only ever
    # prune, so losing them costs redundancy, never recall. A doc_id
    # outside [0, 2^42) cannot degrade the same way: the high-bits
    # multiply itself would overflow (ANSI error at best, silent
    # corruption with ANSI off), so the budget is asserted per row —
    # one folded comparison, and the id space fails LOUDLY instead of
    # wrapping.
    p_len = f"CAST(floor((1.0 - {floor}) * size(_shc) + 1e-6) AS INT) + 1"
    fits = "CAST(size(_shc) < 1024 AS BIGINT)"
    id_guard = (
        "COALESCE(CAST(assert_true(doc_id >= 0 AND doc_id < 4398046511104, "
        "'doc_id exceeds the 2^42 packed-posting budget') AS BIGINT), 0)"
    )
    # guard FIRST: '+' evaluates left-to-right, so the budget assert
    # fires before the high-bits multiply can ANSI-overflow (and with
    # ANSI off it is the only thing standing between an oversized id
    # and silent wraparound) — one deterministic error either mode.
    packed = (
        f"{id_guard} + doc_id * 2097152 + {fits} * 1048576 "
        f"+ {fits} * (CAST(size(_shc) AS BIGINT) * 1024 + CAST(_pp + 1 AS BIGINT))"
    )
    prefix = shc.selectExpr(
        "doc_id", "_shc", f"posexplode(slice(_shc, 1, {p_len})) AS (_pp, shingle)"
    ).selectExpr(f"{packed} AS pk", "shingle")

    # PPJoin-style pair-emission filters (lossless): for the pair's
    # globally-SMALLEST common token s*, every common token sits at or
    # after s* in both sorted sets, so
    #   overlap <= 1 + min(nx - posx, ny - posy)        (ubound)
    # and the similarity floor lower-bounds the overlap:
    #   jaccard t:      o >= t*(nx+ny)/(1+t)
    #   containment t:  o >= t*min(nx, ny)
    # A pair passes at its s*-emission whenever it can reach the
    # floor, so filtering EVERY emission by `ubound >= alpha` keeps
    # recall and prunes the redundant later-witness emissions (a
    # near-dup pair otherwise re-emits from every shared prefix
    # token — measured ~14x candidate duplication). The epsilons round
    # alpha DOWN, weakening the filter under float error, never
    # strengthening it. Emissions with either side's `fits` bit off
    # pass unconditionally. Note the length-ratio bound is a SPECIAL
    # CASE of this filter: at px=py=1 for jaccard t it reduces to
    # min(nx,ny) >= t*(nx+ny)/(1+t) <=> min/max >= t — so every
    # cross-length-band candidate is already dropped at its first
    # possible emission, and the pre-exchange byte cut comes from the
    # hashed posting key instead (log-length bucketing the postings
    # would need a neighbor-bucket replica per posting, DOUBLING the
    # exchange it is meant to shrink).
    unpack = (
        "CASE WHEN (pmod(x div 1048576, 2) = 0) OR (pmod(y div 1048576, 2) = 0) "
        "THEN true ELSE {pred} END"
    )
    nx, px = "pmod(x div 1024, 1024)", "pmod(x, 1024)"
    ny, py = "pmod(y div 1024, 1024)", "pmod(y, 1024)"
    ub = f"(1 + least({nx} - {px}, {ny} - {py}))"
    if jaccard_floor is not None:
        alpha = f"ceil({floor} * ({nx} + {ny}) / (1.0 + {floor}) - 1e-9)"
        buckets = (
            prefix.groupBy("shingle")
            .agg(F.sort_array(F.collect_list("pk")).alias("L"))
            .where(F.size("L") >= 2)
        )
        cand = (
            pair_explode(buckets, "L", "x", "y", keep=[])
            .where(F.expr(unpack.format(pred=f"{ub} >= {alpha}")))
            .selectExpr("x div 2097152 AS da", "y div 2097152 AS db")
            .distinct()
        )
    else:
        alpha = f"ceil({floor} * least({nx}, {ny}) - 1e-9)"
        full = shc.selectExpr(
            "doc_id", "_shc", "posexplode(_shc) AS (_pp, shingle)"
        ).selectExpr(f"{packed} AS y", "shingle")
        cand = (
            prefix.withColumnRenamed("pk", "x")
            .join(full, "shingle")
            .where(F.expr("x div 2097152 != y div 2097152"))
            .where(F.expr(unpack.format(pred=f"{ub} >= {alpha}")))
            .selectExpr(
                "least(x div 2097152, y div 2097152) AS da",
                "greatest(x div 2097152, y div 2097152) AS db",
            )
            .distinct()
        )
    # Exact verify: the (tiny, verified-small) candidate set
    # broadcasts into two map-side joins against the checkpointed
    # capped arrays — the candidate pipeline executes once (broadcast
    # build), the corpus never shuffles, and no second checkpoint
    # barrier is paid. Same broadcast-bounded-candidate assumption as
    # the MinHash verify stage; a larger-than-broadcast candidate set
    # would shuffle-join instead.
    return (
        F.broadcast(cand)
        .join(shc.select(F.col("doc_id").alias("da"), F.col("_shc").alias("_sa")), "da")
        .join(shc.select(F.col("doc_id").alias("db"), F.col("_shc").alias("_sb")), "db")
        .select(
            "da",
            "db",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("inter"),
            F.size("_sa").cast("long").alias("na"),
            F.size("_sb").cast("long").alias("nb"),
        )
        .where(F.col("inter") >= 1)
    )


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
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
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= {_DF_CAP}),
    kept AS (SELECT e.doc_id, e.shingle FROM ex e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS BIGINT) AS n_common,
           ROUND(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    """Near-dup detection: word-3-gram shingles with a document-
    frequency cap (df <= 16 — stop-shingles removed from the universe),
    candidate pairs via shingle equi-join (inverted index — NEVER a
    doc-doc cross join), exact Jaccard >= 0.5 over the capped universe.

    The cap is what makes the EXACT path survive 100 TB: without it a
    stop-shingle in d documents emits d^2/2 pairs from one group;
    with it every inverted-index group is O(K^2). Jaccard is computed
    as if stop-shingles don't exist (sizes AND intersections), the same
    semantics as the oracle's HAVING on the inverted index."""
    jac = F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        _capped_pair_counts(spark, sf_dir, jaccard_floor=0.5)
        .where(jac >= 0.5)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("inter").alias("n_common"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(regexp_extract_all(LOWER(text), '[a-z0-9]+')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT doc_id, term,
               ROUND(tf * LN((n + 1.0) / (df + 1.0)), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """TF-IDF keyword extraction: top-3 terms per document by
    smoothed tf-idf (tf * ln((N+1)/(df+1))), ties broken by term.

    Scale shape: tokenize+explode is a pure map; (doc, term) tf and
    per-term df are two hash aggregations with map-side partials; the
    corpus size N and the df table join back in (df is broadcast-sized
    after aggregation — vocabulary, not corpus); ranking is one window
    partitioned by doc_id. Ranking happens on the ROUNDED score on
    both engines so float ties break identically."""
    d = spread_scan(  # spread the single-row-group scan; no-op at scale
        load_table(spark, "documents", sf_dir), "doc_id"
    )
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


# Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) parameters: 4-char
# grams, window of 8 — every run of 8 consecutive gram hashes
# contributes its minimum, so any shared substring of length >= 11
# chars yields a shared fingerprint. md5-hex is the hash: identical
# text -> identical lowercase hex in BOTH engines, and the window min
# is a plain lexicographic string min.
_WINNOW_K = 4
_WINNOW_W = 8


@register(
    "winnow_fingerprints",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               CASE WHEN LENGTH(text) < {_WINNOW_K} THEN []
                    ELSE list_transform(range(1, LENGTH(text) - {_WINNOW_K} + 2),
                                        i -> md5(substr(text, CAST(i AS INTEGER), {_WINNOW_K})))
               END AS G
        FROM documents
    ),
    f AS (
        SELECT doc_id, CASE
            WHEN LEN(G) = 0 THEN []
            WHEN LEN(G) < {_WINNOW_W} THEN [list_min(G)]
            ELSE list_distinct(list_transform(range(1, LEN(G) - {_WINNOW_W} + 2),
                     j -> list_min(G[CAST(j AS INTEGER):CAST(j + {_WINNOW_W} - 1 AS INTEGER)])))
        END AS fps FROM g
    )
    SELECT doc_id, UNNEST(fps) AS fp FROM f
    """,
)
def winnow_fingerprints(spark, sf_dir):
    """Document fingerprinting by winnowing: rolling k-gram hashes,
    one fingerprint per window minimum, distinct per document. The
    copy-detection primitive — two documents sharing any >= k+w-1 char
    run share a fingerprint, so a fingerprint equi-join finds
    candidate plagiarism/near-copy pairs the same inverted-index way
    ngram_jaccard_pairs does.

    Pure map over the scan at real scale; the gram array is let-bound
    so the window transform reads it once instead of re-hashing the
    text per window (CollapseProject would otherwise inline it). One
    caveat below: if the input arrives with fewer splits than cores
    (the single-file test parquet), a one-time spread repartition runs
    first — skipped entirely when the scan is already parallel."""
    from wnv_etl_lab2_spark.operators.geometry import let_sql

    k, w = _WINNOW_K, _WINNOW_W
    grams = (
        f"CASE WHEN length(text) < {k} THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE transform(sequence(1, length(text) - {k} + 1), "
        f"i -> md5(substring(text, i, {k}))) END"
    )
    fps = let_sql(
        grams,
        "_G",
        f"CASE WHEN size(_G) = 0 THEN CAST(array() AS ARRAY<STRING>) "
        f"WHEN size(_G) < {w} THEN array(array_min(_G)) "
        f"ELSE array_distinct(transform(sequence(1, size(_G) - {w} + 1), "
        f"j -> array_min(slice(_G, j, {w})))) END",
    )
    d = load_table(spark, "documents", sf_dir)
    # spread the md5-per-gram map stage ONLY when the scan has fewer
    # splits than the shuffle parallelism (single-file test parquet);
    # an already-parallel scan keeps its zero-shuffle plan. NOT width-
    # right-sized (round 18): this map is md5-per-gram CPU-bound, so
    # narrowing the spread starves cores (A/B'd — see OPTIMIZATION_r18).
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if d.rdd.getNumPartitions() < nparts:
        d = d.repartition(nparts, "doc_id")
    return d.select("doc_id", F.explode(F.expr(fps)).alias("fp"))


@register(
    "decontamination_overlap",
    oracle="""
    WITH docs AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
    sh AS (
        SELECT doc_id, source,
               list_distinct(list_transform(range(1, LEN(words) - 1),
                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingles
        FROM docs WHERE LEN(words) >= 3
    ),
    ex AS (SELECT doc_id, source, UNNEST(shingles) AS shingle FROM sh),
    train AS (SELECT DISTINCT shingle FROM ex WHERE source <> 'src0'),
    eval_g AS (SELECT doc_id, shingle FROM ex WHERE source = 'src0'),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM eval_g GROUP BY doc_id),
    hit AS (SELECT doc_id, COUNT(*) AS n_shared
            FROM eval_g e JOIN train t USING (shingle) GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
           ROUND(COALESCE(h.n_shared, 0) * 1.0 / t.n_grams, 6) AS contamination
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
)
def decontamination_overlap(spark, sf_dir):
    """Train/eval decontamination: per eval document (source = src0),
    the fraction of its distinct word-3-grams that appear anywhere in
    the training split (every other source) — the benchmark-leakage
    check every LLM data pipeline runs before training.

    Scale shape: one shingle pipeline feeds both splits; the train
    side collapses to a DISTINCT gram vocabulary (aggregated, far
    smaller than the corpus) and the probe is a semi join on the
    hashed gram — the inverted-index shape, never doc x doc. Grams are
    xxhash64-hashed like every other shingle op here (collisions
    ~2^-40, counts match the string-keyed oracle)."""
    from wnv_etl_lab2_spark.operators.dedup import hashed_word_shingles

    d = load_table(spark, "documents", sf_dir)
    words = F.split("text", " ")
    docs = d.select("doc_id", "source", words.alias("words")).where(F.size("words") >= 3)
    ex = docs.select(
        "doc_id", "source", F.explode(hashed_word_shingles("words")).alias("shingle")
    )
    train = ex.where(F.col("source") != "src0").select("shingle").distinct()
    eval_g = ex.where(F.col("source") == "src0").select("doc_id", "shingle")
    tot = eval_g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hit = (
        eval_g.join(train, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    shared = F.coalesce(F.col("n_shared"), F.lit(0))
    return tot.join(hit, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        shared.cast("long").alias("n_shared"),
        F.round(shared * 1.0 / F.col("n_grams"), 6).alias("contamination"),
    )


@register(
    "repetition_filter",
    oracle="""
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    sh AS (
        SELECT doc_id,
               list_transform(range(1, LEN(words) - 1),
                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS grams
        FROM docs WHERE LEN(words) >= 3
    )
    SELECT doc_id,
           CAST(LEN(grams) AS BIGINT) AS n_grams,
           CAST(LEN(list_distinct(grams)) AS BIGINT) AS n_distinct,
           ROUND(1.0 - LEN(list_distinct(grams)) * 1.0 / LEN(grams), 6) AS rep_frac
    FROM sh
    """,
)
def repetition_filter(spark, sf_dir):
    """Repetition quality signal (the Gopher/MassiveText family):
    fraction of word-3-grams that are repeats within the document.
    Heavily repeated boilerplate scores high and gets filtered before
    training. Pure map — the gram array never leaves the row; the
    array and its distinct form are let-bound so each computes once
    (NON-distinct grams, so this can't share hashed_word_shingles)."""
    from wnv_etl_lab2_spark.operators.geometry import let_sql

    d = load_table(spark, "documents", sf_dir)
    grams = (
        "transform(sequence(0, size(_words) - 3), "
        "i -> xxhash64(_words[i] || ' ' || _words[i+1] || ' ' || _words[i+2]))"
    )
    stats = let_sql(
        grams,
        "_g",
        let_sql(
            "array_distinct(_g)",
            "_d",
            "named_struct("
            "'n_grams', CAST(size(_g) AS BIGINT), "
            "'n_distinct', CAST(size(_d) AS BIGINT), "
            # 1.0D: a bare 1.0 literal is DECIMAL(2,1) in Spark SQL
            # text, which silently turns the whole ratio into a
            # decimal column instead of a double
            "'rep_frac', round(1.0D - size(_d) * 1.0D / size(_g), 6))",
        ),
    )
    return (
        d.selectExpr("doc_id", "split(text, ' ') AS _words")
        .where(F.size("_words") >= 3)
        .selectExpr("doc_id", f"inline(array({stats}))")
    )


@register(
    "ngram_counts_top",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    b AS (
      SELECT doc_id, words[g] || ' ' || words[g + 1] AS bigram
      FROM w, UNNEST(generate_series(1, LEN(words) - 1)) AS t(g)
      WHERE LEN(words) >= 2
    )
    SELECT bigram, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
    FROM b GROUP BY bigram
    ORDER BY n_occ DESC, bigram LIMIT 20
    """,
)
def ngram_counts_top(spark, sf_dir):
    """Corpus-wide bigram frequency table (top 20 by occurrence,
    bigram text as the deterministic tiebreak) with document
    frequency — the n-gram LM-statistics query a corpus audit runs.
    The explode emits n-1 bigram rows per doc (linear in corpus
    tokens), the count is a map-side-combinable groupBy, and the
    top-20 is TakeOrdered — no global sort."""
    d = spread_scan(  # spread the single-row-group scan; no-op at scale
        load_table(spark, "documents", sf_dir), "doc_id"
    )
    bigrams = F.expr(
        "transform(sequence(1, size(words) - 1), "
        "i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"
    )
    ex = (
        d.select(F.col("doc_id"), F.split("text", " ").alias("words"))
        .where(F.size("words") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    return (
        ex.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occ"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n_occ").desc(), F.col("bigram"))
        .limit(20)
    )


@register(
    "bpe_pair_merge_counts",
    oracle="""
    WITH w AS (
      SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    p AS (
      SELECT UNNEST(list_transform(range(1, CAST(LENGTH(w) AS BIGINT)),
                    i -> substr(w, CAST(i AS BIGINT), 2))) AS pair
      FROM w WHERE LENGTH(w) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
)
def bpe_pair_merge_counts(spark, sf_dir):
    """The first step of BPE/WordPiece vocabulary induction: global
    frequencies of ADJACENT CHARACTER PAIRS within words, top-20 —
    the statistic each merge round of tokenizer training maximizes
    (the full trainer iterates this same job on re-segmented corpora).

    Scale shape: two explodes (word, then character pair) feeding one
    hash aggregate with map-side partial combine — the pair alphabet
    is tiny (<= |charset|^2 keys), so the shuffle is a few KB of
    partial counts per task regardless of corpus size; the top-20 is a
    TakeOrdered, never a global sort."""
    d = load_table(spark, "documents", sf_dir)
    words = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(20)
    )


@register(
    "containment_pairs",
    oracle=f"""
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
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= {_DF_CAP}),
    kept AS (SELECT e.doc_id, e.shingle FROM ex e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(inter AS BIGINT) AS n_common,
           ROUND(inter * 1.0 / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / LEAST(sa.n_sh, sb.n_sh) >= 0.8
    """,
)
def containment_pairs(spark, sf_dir):
    """Asymmetric near-dup detection: CONTAINMENT of the smaller
    shingle set in the larger, |A n B| / min(|A|, |B|) >= 0.8 —
    catches partial duplication Jaccard misses by construction (a
    short document quoted verbatim inside a long one has tiny Jaccard
    but containment ~1; the boilerplate-wrapper and excerpt cases a
    crawl corpus is full of). Resemblance vs containment is the
    classic Broder distinction; the production approximation replaces
    the exact count with MinHash the same way dedup_minhash_lsh does
    for Jaccard.

    Same scale shape as ngram_jaccard_pairs — df-capped inverted
    index, pair expansion bounded per group, digests-only shuffle —
    the final metric is the only difference."""
    cont = F.col("inter") * 1.0 / F.least(F.col("na"), F.col("nb"))
    return (
        _capped_pair_counts(spark, sf_dir, containment_floor=0.8)
        .where(cont >= 0.8)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.col("inter").alias("n_common"),
            F.round(cont, 6).alias("containment"),
        )
    )


@register(
    "neardup_threshold_sweep",
    # Exact Jaccard distribution over the capped pair universe at the
    # thresholds an LSH banding would be tuned against — the
    # measurement that picks (bands, rows-per-band) before a 100 TB
    # dedup run. Thresholds with zero surviving pairs still report a
    # row (conditional aggregation, not a filter).
    oracle=f"""
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
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= {_DF_CAP}),
    kept AS (SELECT e.doc_id, e.shingle FROM ex e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    j AS (
        SELECT inter * 1.0 / (sa.n_sh + sb.n_sh - inter) AS jac
        FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id
    ),
    t AS (SELECT UNNEST([0.3, 0.5, 0.7, 0.9]) AS threshold)
    SELECT threshold,
           CAST(COUNT(CASE WHEN jac >= threshold THEN 1 END) AS BIGINT) AS n_pairs,
           ROUND(COALESCE(AVG(CASE WHEN jac >= threshold THEN jac END), 0.0), 6)
             AS avg_jaccard
    FROM t CROSS JOIN j
    GROUP BY threshold
    """,
)
def neardup_threshold_sweep(spark, sf_dir):
    """Threshold sweep over the EXACT near-dup pair graph: for each
    candidate dedup threshold, how many pairs survive and their mean
    Jaccard — the tuning table consulted before committing a banding
    scheme (1-(1-j^r)^b) to a full-corpus run. One pass over the
    capped-inverted-index backbone shared with `ngram_jaccard_pairs`;
    the 4-row threshold table is the scalar-broadcast crossJoin
    pattern, and conditional aggregation keeps zero-pair thresholds
    in the output."""
    jac = (F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))).alias(
        "jac"
    )
    pairs = _capped_pair_counts(spark, sf_dir, jaccard_floor=0.3).select(jac)
    thresholds = spark.createDataFrame(
        [(0.3,), (0.5,), (0.7,), (0.9,)], "threshold double"
    )
    hit = F.col("jac") >= F.col("threshold")
    return (
        pairs.crossJoin(F.broadcast(thresholds))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_pairs"),
            F.round(
                F.coalesce(F.avg(F.when(hit, F.col("jac"))), F.lit(0.0)), 6
            ).alias("avg_jaccard"),
        )
    )


@register(
    "zipf_top_words",
    # Corpus Zipf profile: top-20 words by frequency with corpus share
    # and cumulative share — the measurement behind stop-word lists
    # and the df-cap (_DF_CAP) the near-dup index relies on.
    oracle="""
    WITH toks AS (
        SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    c AS (SELECT w, COUNT(*) AS cnt FROM toks WHERE w <> '' GROUP BY w),
    tot AS (SELECT SUM(cnt) AS t FROM c),
    ranked AS (
        SELECT w, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rank,
               SUM(cnt) OVER (ORDER BY cnt DESC, w) AS cum
        FROM c
    )
    SELECT CAST(rank AS BIGINT) AS rank, w AS word,
           CAST(cnt AS BIGINT) AS cnt,
           ROUND(cnt * 1.0 / t, 6) AS share,
           ROUND(cum * 1.0 / t, 6) AS cum_share
    FROM ranked CROSS JOIN tot
    WHERE rank <= 20
    """,
)
def zipf_top_words(spark, sf_dir):
    """Zipf head of the corpus: top-20 words with rank, corpus share,
    and cumulative share (deterministic tie-break by word). Scale
    shape: the head is selected FIRST by a distributed top-k
    (TakeOrdered over the partial-aggregated word counts — a 100 TB
    corpus has a 10-100M-word vocabulary, so a global rank window
    over the full count frame would funnel it through one
    partition); the rank/cumulative window then runs over only the
    20 survivors, and the corpus total joins back as a broadcast
    scalar."""
    d = load_table(spark, "documents", sf_dir)
    toks = d.select(F.explode(F.split("text", " ")).alias("w")).where(F.col("w") != "")
    c = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    tot = c.agg(F.sum("cnt").alias("t"))
    top = c.orderBy(F.desc("cnt"), F.asc("w")).limit(20)
    from pyspark.sql import Window

    order = Window.orderBy(F.desc("cnt"), F.asc("w"))
    ranked = top.select(
        "w",
        "cnt",
        F.row_number().over(order).alias("rank"),
        F.sum("cnt").over(order.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        F.col("rank").cast("long").alias("rank"),
        F.col("w").alias("word"),
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") * 1.0 / F.col("t"), 6).alias("share"),
        F.round(F.col("cum") * 1.0 / F.col("t"), 6).alias("cum_share"),
    )


@register(
    "bigram_pmi_top",
    # Collocation mining: pointwise mutual information of adjacent
    # word pairs, min-count 5, top-20 by PMI (tie-break bigram text).
    # ln of exact integer-count ratios — identical doubles on both
    # engines before the round.
    oracle="""
    WITH toks AS (
      SELECT doc_id, w, i FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
      ) WHERE w <> ''
    ),
    big AS (
      SELECT a.w AS w1, b.w AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      WHERE b.w <> ''
    ),
    cxy AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2),
    nb AS (SELECT SUM(c) AS n FROM cxy),
    cx AS (SELECT w1 AS w, SUM(c) AS cnt FROM cxy GROUP BY w1),
    cy AS (SELECT w2 AS w, SUM(c) AS cnt FROM cxy GROUP BY w2)
    SELECT w1, w2, CAST(c AS BIGINT) AS c,
           ROUND(ln(c * 1.0 * n / (cx.cnt * 1.0 * cy.cnt)), 6) AS pmi
    FROM cxy JOIN cx ON cxy.w1 = cx.w JOIN cy ON cxy.w2 = cy.w
             CROSS JOIN nb
    WHERE c >= 5
    ORDER BY pmi DESC, w1 ASC, w2 ASC
    LIMIT 20
    """,
)
def bigram_pmi_top(spark, sf_dir):
    """Collocation mining: top-20 adjacent word pairs by pointwise
    mutual information, PMI = ln(c_xy * N / (c_x * c_y)) over bigram
    counts with a min-count floor — the statistic behind multiword-
    expression and tokenizer-merge decisions. Bigrams come from an
    in-row zip of the token array with its tail (pure flatMap — no
    positional self-join); marginals are two groupBys over the
    bigram counts (already far smaller than the corpus), the total
    is a broadcast scalar, and the head is a distributed TakeOrdered.
    """
    d = load_table(spark, "documents", sf_dir)
    pairs = d.select(
        F.explode(
            F.expr(
                "filter(zip_with(split(text, ' '), "
                "slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 1, 0)), "
                "(x, y) -> struct(x AS w1, y AS w2)), p -> p.w1 <> '' AND p.w2 <> '')"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cxy = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    cxy = cxy.localCheckpoint(eager=False)  # feeds marginals + total + join
    nb = cxy.agg(F.sum("c").alias("n"))
    cx = cxy.groupBy("w1").agg(F.sum("c").alias("cx"))
    cy = cxy.groupBy("w2").agg(F.sum("c").alias("cy"))
    pmi = F.log(F.col("c") * 1.0 * F.col("n") / (F.col("cx") * 1.0 * F.col("cy")))
    return (
        cxy.where(F.col("c") >= 5)
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(nb))
        .select("w1", "w2", F.col("c").cast("long").alias("c"), F.round(pmi, 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


@register(
    "stop_shingle_report",
    # The audit behind the _DF_CAP knob: the highest-document-
    # frequency word-3-grams, each flagged if the near-dup index
    # drops it as a stop-shingle. Grams stay STRINGS here (this is a
    # human-facing report and the df ranking needs no joins), so the
    # oracle shares them verbatim.
    oracle=f"""
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
    df AS (SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle)
    SELECT shingle, CAST(df AS BIGINT) AS df, df > {_DF_CAP} AS is_dropped
    FROM df
    ORDER BY df DESC, shingle ASC
    LIMIT 20
    """,
)
def stop_shingle_report(spark, sf_dir):
    """Stop-shingle audit: the 20 highest-document-frequency word-3-
    grams with their df and whether the near-dup inverted index drops
    them under the _DF_CAP (16) — the evidence a reviewer
    checks before trusting the cap (it must bite boilerplate, not
    content). Distinct-shingle explode, one partial-aggregated
    groupBy, TakeOrdered head — no joins, linear at any corpus size.
    """
    d = load_table(spark, "documents", sf_dir)
    words = F.split("text", " ")
    docs = d.select("doc_id", words.alias("words")).where(F.size("words") >= 3)
    sh = docs.selectExpr(
        "doc_id",
        "array_distinct(transform(sequence(0, size(words) - 3), "
        "i -> concat(words[i], ' ', words[i+1], ' ', words[i+2]))) AS shingles",
    )
    ex = sh.select(F.explode("shingles").alias("shingle"))
    return (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .select("shingle", "df", (F.col("df") > _DF_CAP).alias("is_dropped"))
        .orderBy(F.col("df").desc(), F.col("shingle").asc())
        .limit(20)
    )


# Fixed retrieval query for the BM25 demo — terms from the corpus
# vocabulary, pinned so the query (and its oracle) is deterministic.
_BM25_TERMS = ("spark", "query", "join", "vector", "stream")
_BM25_K1, _BM25_B = 1.2, 0.75
# One shared scoring fragment evaluated by F.expr on the Spark side
# and pasted verbatim into the DuckDB oracle: identical literal text
# -> identical IEEE operation order -> bit-equal doubles pre-round.
_BM25_SCORE = (
    f"ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * ({_BM25_K1} + 1)) "
    f"/ (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
)


@register(
    "bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    dl AS (
        SELECT doc_id,
               LEN(list_filter(string_split(text, ' '), t -> t <> '')) AS dl
        FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, w, COUNT(*) AS tf FROM toks
        WHERE w IN {str(tuple(_BM25_TERMS))} GROUP BY doc_id, w
    ),
    idf AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    scored AS (
        SELECT tf.doc_id, ROUND(SUM({_BM25_SCORE}), 6) AS bm25
        FROM tf JOIN idf USING (w) JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, bm25 FROM (
        SELECT doc_id, bm25,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
        FROM scored
    ) WHERE rank <= 20
    """,
)
def bm25_topk(spark, sf_dir):
    """BM25 retrieval over the corpus for a fixed term query — the
    lexical-search operator of a RAG / data-curation stack (Robertson-
    Sparck Jones IDF, k1=1.2 b=0.75). Scale shape: term-frequency
    rows exist only for docs matching a query term (the IN filter
    runs before the groupBy), document length and corpus stats are a
    map-side projection plus one broadcast scalar, the per-term df
    table broadcasts, and the final top-20 is a distributed
    TakeOrdered on the ROUNDED score (ranking on rounded values is
    what makes the cutoff engine-portable) — never a global sort.
    The scoring arithmetic is one shared SQL fragment on both engines
    (_BM25_SCORE), so the doubles agree bit-for-bit pre-round."""
    from pyspark.sql import Window

    d = load_table(spark, "documents", sf_dir)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    dl = d.selectExpr(
        "doc_id", "size(filter(split(text, ' '), t -> t <> '')) AS dl"
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.where(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.expr(_BM25_SCORE)), 6).alias("bm25"))
    )
    top = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)
    order = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(order).cast("long").alias("rank"), "doc_id", "bm25"
    )


@register(
    "unigram_logprob_quality",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    t AS (SELECT doc_id, w FROM toks WHERE w <> ''),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM t GROUP BY w),
    corpus AS (SELECT SUM(cnt) AS total, COUNT(*) AS v FROM vocab)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           ROUND(AVG(ln((cnt + 1.0) / (total + v))), 6) AS avg_logprob
    FROM t JOIN vocab USING (w) CROSS JOIN corpus
    GROUP BY doc_id
    """,
)
def unigram_logprob_quality(spark, sf_dir):
    """Unigram-LM quality score: train add-1-smoothed token
    probabilities on the corpus itself, score each document by its
    mean token log-probability — the CCNet-style LM-perplexity proxy
    a curation pipeline thresholds on (implausible token mixes score
    low). Scale shape: the vocabulary aggregate is one partial-
    combined groupBy on the token (counts only — never doc ids); the
    trained table broadcasts back (a 10M-word vocab is ~100 MB — the
    normal LM-scoring deployment), so scoring is a map-side join plus
    one per-doc digest aggregate. Mean-of-logs over ~50 doubles
    differs across engines only in summation order (~1e-15); both
    sides round at 6 dp."""
    d = load_table(spark, "documents", sf_dir)
    t = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    vocab = t.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    corpus = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("v")
    )
    return (
        t.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.avg(F.expr("ln((cnt + 1.0) / (total + v))")), 6).alias(
                "avg_logprob"
            ),
        )
    )


@register(
    "lsh_recall_forecast",
    # The shipped banding config (minhash_lsh_pairs defaults:
    # 32 hashes = 16 bands x r=2) applied to the EXACT pair-similarity
    # distribution: per 0.1-wide Jaccard bucket, how many true pairs
    # exist and what fraction the banded LSH is expected to surface —
    # the S-curve 1 - (1 - j^r)^b evaluated pair-by-pair, averaged per
    # bucket. This is the go/no-go audit before trusting the banding
    # on a corpus: a bucket above the dedup threshold with low
    # expected recall means add hashes or widen bands.
    oracle=f"""
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
    keep AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= {_DF_CAP}),
    kept AS (SELECT e.doc_id, e.shingle FROM ex e JOIN keep USING (shingle)),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    j AS (
        SELECT inter * 1.0 / (sa.n_sh + sb.n_sh - inter) AS jac
        FROM pairs JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id
    )
    SELECT FLOOR(jac * 10) / 10 AS sim_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(jac), 6) AS avg_jaccard,
           ROUND(AVG(1 - POWER(1 - POWER(jac, 2), 16)), 6)
             AS expected_lsh_recall
    FROM j WHERE jac >= 0.3
    GROUP BY 1
    """,
)
def lsh_recall_forecast(spark, sf_dir):
    """Expected MinHash-LSH recall per similarity bucket for the
    SHIPPED banding config (16 bands x 2 rows): the S-curve
    1 - (1 - j^r)^b averaged over the exact pairs in each 0.1-wide
    Jaccard bucket — what fraction of each bucket's true pairs the
    banded join will surface. Complements `neardup_threshold_sweep`
    (which sizes the pair population) with the recall side of the
    banding decision; both ride the same capped-inverted-index
    backbone, one extra conditional aggregation."""
    jac = (
        F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    ).alias("jac")
    pairs = _capped_pair_counts(spark, sf_dir, jaccard_floor=0.3).select(jac)
    curve = 1 - F.pow(1 - F.pow(F.col("jac"), 2), 16)
    return (
        pairs.where(F.col("jac") >= 0.3)
        .groupBy((F.floor(F.col("jac") * 10) / 10).alias("sim_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg("jac"), 6).alias("avg_jaccard"),
            F.round(F.avg(curve), 6).alias("expected_lsh_recall"),
        )
    )


@register(
    "bigram_logprob_quality",
    # Conditional bigram LM with add-0.5 smoothing, trained on the
    # corpus itself: P(cur | prev) = (c(prev,cur) + 0.5) /
    # (c(prev as context) + 0.5 V). Documents score by the mean log
    # of their TRANSITIONS (docs need >= 2 tokens); the context
    # counts derive from the bigram table (one pass), V is the full
    # unigram vocabulary.
    oracle="""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, ws[i] AS prev, ws[i + 1] AS cur
      FROM docs, LATERAL (SELECT UNNEST(range(1, len(ws))) AS i) AS u
      WHERE len(ws) >= 2
    ),
    bg AS (SELECT prev, cur, COUNT(*) AS c2 FROM pairs GROUP BY prev, cur),
    ctx AS (SELECT prev, SUM(c2) AS c1 FROM bg GROUP BY prev),
    vb AS (
      SELECT COUNT(DISTINCT w) AS v
      FROM (SELECT UNNEST(ws) AS w FROM docs)
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trans,
           ROUND(AVG(ln((bg.c2 + 0.5) / (ctx.c1 + 0.5 * vb.v))), 6)
             AS avg_logprob2
    FROM pairs p
    JOIN bg USING (prev, cur)
    JOIN ctx USING (prev)
    CROSS JOIN vb
    GROUP BY p.doc_id
    """,
)
def bigram_logprob_quality(spark, sf_dir):
    """Bigram-LM quality score — the conditional upgrade of
    `unigram_logprob_quality`: train add-0.5-smoothed transition
    probabilities P(cur | prev) on the corpus, score each document by
    the mean log-probability of its transitions. A doc of plausible
    words in an implausible ORDER (shuffled/templated/generated text)
    scores low here while the unigram model cannot see it — the
    CCNet-perplexity signal proper. Scale shape: transitions come
    from an in-array HOF (no self-join of positions); the bigram and
    context tables are one combinable groupBy each (counts only,
    never doc ids) and broadcast back vocabulary-sized, so scoring is
    map-side joins plus one per-doc digest aggregate — the tf-idf
    join-back shape."""
    d = load_table(spark, "documents", sf_dir)
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    docs = d.select("doc_id", ws.alias("ws"))
    # sequence(1, 0) would DESCEND: guard to docs with >= 2 tokens
    pairs = (
        docs.where(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("prev"),
                        F.element_at("ws", i + 1).alias("cur"),
                    ),
                )
            ).alias("t"),
        )
        .select("doc_id", "t.prev", "t.cur")
    )
    bg = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    ctx = bg.groupBy("prev").agg(F.sum("c2").alias("c1"))
    vb = (
        docs.select(F.explode("ws").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    return (
        pairs.join(F.broadcast(bg), ["prev", "cur"])
        .join(F.broadcast(ctx), "prev")
        .crossJoin(F.broadcast(vb))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.round(
                F.avg(F.expr("ln((c2 + 0.5) / (c1 + 0.5 * v))")), 6
            ).alias("avg_logprob2"),
        )
    )


@register("heavy_hitters_cms")  # sketch internals are engine-specific -> rows-only;
# the CMS guarantees (est >= exact, est <= exact + eps*N) are pinned in
# tests/test_oracle.py::test_cms_estimates_within_bounds
def heavy_hitters_cms(spark, sf_dir):
    """Heavy-hitter word counts via a Count-Min sketch, shipped
    side-by-side with the exact counts (the `approx_distinct_stats`
    pattern: the approximate operator is the 100 TB path, the exact
    twin is the local validation). The sketch aggregates DISTRIBUTED
    (count_min_sketch is a partial-merge aggregate — counter matrices
    add, so the merge is order-independent and the seeded sketch is
    deterministic); only the ~11 KB serialized sketch reaches the
    driver, which probes it for the exact top-20 words through the
    JVM sketch library — a bounded driver artifact in the same class
    as the 512-row IVF sample. At corpus scale the exact count
    aggregate is the expensive side; a production deployment keeps
    ONLY the sketch (fixed bytes at any corpus size) and serves
    point-frequency queries from it.

    Sketch: eps=0.001 (error <= 0.1% of total token mass), conf=0.99,
    seed=42. Output: (word, exact_cnt, est_cnt), top-20 by exact
    count with deterministic word tie-break."""
    d = load_table(spark, "documents", sf_dir)
    toks = d.select(F.explode(F.split("text", " ")).alias("w")).where(F.col("w") != "")
    top = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("w"))
        .limit(20)
    )
    sketch_bytes = bytes(
        toks.selectExpr(
            "count_min_sketch(w, 0.001d, 0.99d, 42) AS cms"
        ).head()["cms"]
    )
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(sketch_bytes)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    rows = [
        (r["w"], r["exact_cnt"], int(cms.estimateCount(r["w"])))
        for r in top.collect()
    ]
    return spark.createDataFrame(
        rows, "word string, exact_cnt bigint, est_cnt bigint"
    )


@register(
    "fuzzy_prefix_pairs",
    oracle="""
    WITH p AS (
        SELECT doc_id, substr(text, 1, 40) AS pfx,
               string_split(substr(text, 1, 40), ' ') AS w
        FROM documents WHERE LENGTH(text) >= 40
    ),
    k AS (
        SELECT doc_id, pfx, w[1] || ' ' || w[2] AS blk
        FROM p WHERE LEN(w) >= 2
    ),
    keep AS (SELECT blk FROM k GROUP BY blk HAVING COUNT(*) <= 256)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist
    FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
    JOIN keep ON a.blk = keep.blk
    WHERE levenshtein(a.pfx, b.pfx) <= 8
    """,
)
def fuzzy_prefix_pairs(spark, sf_dir):
    """Fuzzy string matching (new family, round 8): document pairs
    whose 40-char openers are within edit distance 8 — the
    entity-resolution / boilerplate-opener primitive (fuzzy-join a
    dirty key column to itself, or cluster near-identical templated
    prefixes before dedup).

    Scale shape — the classic blocked fuzzy join: candidates come from
    an equi-join on a BLOCKING KEY (the first two tokens), never a
    string cross join, with a declared block-size cap (256, mirroring
    the df-cap contract of the shingle index: an over-hot block is
    boilerplate by definition and is reported by template detection,
    not pair-expanded quadratically). The recall contract is explicit:
    pairs differing inside the first two tokens are out of scope, the
    same kind of pinned blocking trade as the LSH band contract.
    Distance is computed with Spark's THRESHOLDED levenshtein — the
    banded O(k*n) DP that abandons a pair as soon as the distance
    provably exceeds 8 — so the per-candidate cost is bounded by the
    threshold, not the string length squared."""
    d = load_table(spark, "documents", sf_dir)
    p = d.where(F.length("text") >= 40).select(
        "doc_id",
        F.substring("text", 1, 40).alias("pfx"),
        F.split(F.substring("text", 1, 40), " ").alias("w"),
    )
    k = p.where(F.size("w") >= 2).select(
        "doc_id",
        "pfx",
        F.concat_ws(" ", F.col("w")[0], F.col("w")[1]).alias("blk"),
    )
    # Broadcast the HOT-BLOCK COMPLEMENT, not the keep set (round-9
    # fix of the r8 broadcast-side hazard): at corpus scale the set of
    # blocks with cnt <= 256 is ~every distinct two-token opener —
    # billions of near-unique keys, far past any broadcast limit. The
    # complement (cnt > 256) is tiny BY CONSTRUCTION — a block only
    # crosses the cap by being boilerplate, and boilerplate openers
    # number in the thousands at any corpus size — so the anti-join's
    # build side is bounded regardless of scale. The hot blocks it
    # drops are the quadratic hazard; template detection reports them.
    hot = (
        k.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 256)
        .select("blk")
    )
    kc = k.join(F.broadcast(hot), "blk", "left_anti")
    # bucket-explode instead of a self-join: ONE exchange groups the
    # (capped) block members, sort_array gives the deterministic
    # doc_id order, and pair_explode emits each unordered pair once —
    # the hot-block anti-join runs BEFORE collect_list, so no bucket
    # array is ever materialized past the declared cap (a monster
    # boilerplate block never becomes one multi-GB array row)
    from wnv_etl_lab2_spark.operators.dedup import pair_explode

    buckets = (
        kc.groupBy("blk")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "pfx"))).alias("L"))
        .where(F.size("L") >= 2)
    )
    pairs = pair_explode(buckets, "L", "x", "y", keep=[])
    dist = F.levenshtein(F.col("x.pfx"), F.col("y.pfx"), 8)
    return pairs.where(dist >= 0).select(
        F.col("x.doc_id").alias("doc_a"),
        F.col("y.doc_id").alias("doc_b"),
        dist.cast("long").alias("edit_dist"),
    )


@register(
    "classifier_confusion_matrix",
    oracle="""
    WITH pred AS (
        SELECT lang,
               CASE WHEN LEN(regexp_extract_all(LOWER(text), '\\b(the|a|of|and|is)\\b'))
                         >= LEN(regexp_extract_all(LOWER(text), '\\b(el|la|de|los|es)\\b'))
                    THEN 'en' ELSE 'es' END AS predicted_lang
        FROM documents
    ),
    cm AS (
        SELECT lang, predicted_lang, COUNT(*) AS n
        FROM pred GROUP BY lang, predicted_lang
    ),
    tot AS (SELECT lang, SUM(n) AS lang_total FROM cm GROUP BY lang)
    SELECT cm.lang, cm.predicted_lang, CAST(cm.n AS BIGINT) AS n,
           ROUND(cm.n * 1.0 / tot.lang_total, 6) AS row_share
    FROM cm JOIN tot ON cm.lang = tot.lang
    """,
)
def classifier_confusion_matrix(spark, sf_dir):
    """Classifier evaluation as a first-class operator (round 8): the
    confusion matrix of the stopword language-ID heuristic against the
    labeled lang column, with per-true-label row shares — the
    eval-sheet every heuristic/model label pass in a curation pipeline
    needs before its output is trusted for filtering or mixing.

    Scale shape: prediction is a pure map fused into the scan; the
    matrix is one partial-aggregated groupBy whose key space is
    |labels| x |predictions| (constant), and the row-share join-back
    operates on that constant-sized matrix — at 100 TB exactly one
    combinable aggregation crosses the network, carrying a handful of
    rows per task."""
    d = load_table(spark, "documents", sf_dir)
    en = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\b(the|a|of|and|is)\b"), F.lit(0))
    )
    es = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\b(el|la|de|los|es)\b"), F.lit(0))
    )
    pred = d.select(
        "lang", F.when(en >= es, "en").otherwise("es").alias("predicted_lang")
    )
    cm = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from pyspark.sql import Window as W

    tot = F.sum("n").over(W.partitionBy("lang"))
    return cm.select(
        "lang",
        "predicted_lang",
        "n",
        F.round(F.col("n") * 1.0 / tot, 6).alias("row_share"),
    )


@register(
    "template_openers",
    oracle="""
    WITH p AS (
        SELECT doc_id, string_split(substr(text, 1, 40), ' ') AS w
        FROM documents WHERE LENGTH(text) >= 40
    ),
    k AS (
        SELECT doc_id, w[1] || ' ' || w[2] AS blk
        FROM p WHERE LEN(w) >= 2
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM k)
    SELECT blk, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(COUNT(*) * 1.0 / ANY_VALUE(tot.n_total), 6) AS share
    FROM k CROSS JOIN tot
    GROUP BY blk
    ORDER BY n_docs DESC, blk ASC
    LIMIT 20
    """,
)
def template_openers(spark, sf_dir):
    """Template / boilerplate-opener detection (round 9): the hottest
    two-token document openers with their corpus share — the REPORT
    side of the blocked fuzzy join's contract (`fuzzy_prefix_pairs`
    drops over-hot opener blocks as boilerplate "reported by template
    detection, not pair-expanded"; this is that detector). A crawl
    corpus's templated pages (navigation shells, cookie banners,
    machine-generated listings) concentrate into a handful of openers,
    and this sheet is what decides the fuzzy join's block cap and the
    dedup pipeline's template denylist.

    Scale shape: the SAME blocking-key derivation as the fuzzy join
    (pure map fused into the scan), one combinable groupBy on the
    opener key, a one-row corpus total broadcast back (never a second
    pass over data), and TakeOrdered for the top-k — no global sort,
    no unbounded state. At 100 TB exactly one aggregation of (opener,
    count) pairs crosses the network."""
    d = load_table(spark, "documents", sf_dir)
    k = (
        d.where(F.length("text") >= 40)
        .select(F.split(F.substring("text", 1, 40), " ").alias("w"))
        .where(F.size("w") >= 2)
        .select(F.concat_ws(" ", F.col("w")[0], F.col("w")[1]).alias("blk"))
    )
    counts = k.groupBy("blk").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "blk",
            "n_docs",
            F.round(F.col("n_docs") * 1.0 / F.col("n_total"), 6).alias("share"),
        )
        .orderBy(F.col("n_docs").desc(), F.col("blk").asc())
        .limit(20)
    )


@register(
    "token_drift_top_contributors",
    oracle="""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    st AS (
        SELECT source, token, COUNT(*) AS n_st
        FROM toks GROUP BY source, token
    ),
    s_tot AS (SELECT source, SUM(n_st) AS n_s FROM st GROUP BY source),
    t_tot AS (SELECT token, SUM(n_st) AS n_t FROM st GROUP BY token),
    g_tot AS (SELECT SUM(n_st) AS n_g FROM st),
    contrib AS (
        SELECT st.source, st.token, st.n_st,
               ROUND((st.n_st * 1.0 / s_tot.n_s)
                     * LN((st.n_st * 1.0 * g_tot.n_g) / (s_tot.n_s * 1.0 * t_tot.n_t)),
                     6) AS kl_contrib
        FROM st
        JOIN s_tot ON st.source = s_tot.source
        JOIN t_tot ON st.token = t_tot.token
        CROSS JOIN g_tot
    )
    SELECT source, token, CAST(n_st AS BIGINT) AS n_st, kl_contrib
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY kl_contrib DESC, token ASC
        ) AS rn
        FROM contrib
    ) WHERE rn <= 5
    """,
)
def token_drift_top_contributors(spark, sf_dir):
    """Corpus drift / source-skew detection (round 9): for every
    source, the tokens contributing most to its KL divergence from the
    corpus-wide token distribution — p(t|s) * ln(p(t|s)/p(t)), the
    per-term decomposition of D_KL(source || corpus). This is the
    sheet a data-mixing pass reads to see WHAT makes a source
    distributionally different (domain jargon, boilerplate, language
    mix) before deciding its mixture weight, and the monitoring signal
    for detecting a crawl snapshot drifting from the training
    distribution.

    Scale shape: one explode + combinable (source, token) count is the
    only corpus-sized aggregation; source totals (|sources| rows) and
    the grand total (1 row) broadcast back, token totals are
    vocabulary-sized and join back exactly like tf-idf's df table. The
    per-source top-k window runs on the vocabulary-sized contribution
    table partitioned by source, never on raw tokens. The ln argument
    is a ratio of integer counts, so both engines evaluate ln at
    bit-identical doubles and ROUND(6) agrees."""
    from pyspark.sql import Window as W

    d = load_table(spark, "documents", sf_dir)
    st = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n_st"))
    )
    s_tot = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    t_tot = st.groupBy("token").agg(F.sum("n_st").alias("n_t"))
    g_tot = st.agg(F.sum("n_st").alias("n_g"))
    contrib = (
        st.join(F.broadcast(s_tot), "source")
        .join(t_tot, "token")
        .join(F.broadcast(g_tot))
        .select(
            "source",
            "token",
            "n_st",
            F.round(
                (F.col("n_st") * 1.0 / F.col("n_s"))
                * F.log(
                    (F.col("n_st") * 1.0 * F.col("n_g"))
                    / (F.col("n_s") * 1.0 * F.col("n_t"))
                ),
                6,
            ).alias("kl_contrib"),
        )
    )
    w = W.partitionBy("source").orderBy(F.col("kl_contrib").desc(), F.col("token").asc())
    return (
        contrib.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("source", "token", F.col("n_st").cast("long").alias("n_st"), "kl_contrib")
    )


@register(
    "chi2_token_source",
    oracle="""
    WITH toks AS (
        SELECT u.w AS w, source
        FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
    ),
    top AS (
        SELECT w, COUNT(*) AS rt FROM toks GROUP BY w
        ORDER BY rt DESC, w ASC LIMIT 20
    ),
    r AS (SELECT toks.w, toks.source FROM toks JOIN top ON toks.w = top.w),
    col AS (SELECT source, COUNT(*) AS ct FROM r GROUP BY source),
    tot AS (SELECT COUNT(*) AS n FROM r),
    obs AS (SELECT w, source, COUNT(*) AS o FROM r GROUP BY w, source),
    cells AS (
        SELECT COALESCE(obs.o, 0) AS o, top.rt * col.ct / tot.n AS e
        FROM top CROSS JOIN col CROSS JOIN tot
        LEFT JOIN obs ON top.w = obs.w AND col.source = obs.source
    )
    SELECT ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2,
           CAST(((SELECT COUNT(*) FROM top) - 1)
                * ((SELECT COUNT(*) FROM col) - 1) AS BIGINT) AS dof
    FROM cells
    """,
)
def chi2_token_source(spark, sf_dir):
    """Chi-squared independence statistic of the top-20 tokens against
    sources (round 11) — the vocabulary-drift audit: a large chi2 says
    token usage is source-specific (templated or topical sources), a
    small one says the mixture is lexically homogeneous. The
    contingency table is restricted to the 20 globally most frequent
    tokens (count-desc, token-asc tie-break — deterministic on both
    engines); ZERO cells still contribute their expected mass, via a
    full top-tokens x sources grid left-joined to the observations.

    Scale shape: exactly TWO corpus passes - the global token count
    (top-20) and the restricted (token, source) contingency count -
    both combinable, token-keyed aggregations. The contingency frame
    is a BOUNDED artifact (<= 20 x |sources| rows), so the per-source
    and grand totals DERIVE from it instead of re-scanning the corpus
    (the first cut re-aggregated the exploded corpus once per total:
    4-5 scans); both bounded frames are localCheckpoint'd because each
    has multiple consumers and a lazy plan would re-run its corpus
    scan per consumer. The 1-row totals cross-join is the registry's
    accepted broadcast pattern. Integer counts keep obs/exp
    engine-exact; the final sum of ~400 cell terms is rounded at 6.
    Local trade, measured: the two checkpoint materializations cost
    ~0.3 s of fixed driver-sync at sf0.1 (0.55 -> 0.88 s) while
    cutting corpus passes 5 -> 2 - the right side of the trade at any
    real scale, same reasoning as source_similarity_matrix's eager tf
    frame."""
    toks = load_table(spark, "documents", sf_dir).select(
        F.explode(F.split("text", " ")).alias("w"), "source"
    )
    top = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("rt"))
        .orderBy(F.col("rt").desc(), F.col("w").asc())
        .limit(20)
        .localCheckpoint()  # 20 rows; 2 consumers (join probe + grid)
    )
    obs = (
        toks.join(F.broadcast(top.select("w")), "w")
        .groupBy("w", "source")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint()  # <= 20 x |sources| rows; 3 consumers
    )
    col = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        top.crossJoin(col)
        .crossJoin(tot)
        .join(F.broadcast(obs), ["w", "source"], "left")
        .select(
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("rt") * F.col("ct") / F.col("n")).alias("e"),
        )
    )
    chi2 = cells.agg(
        F.round(F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")), 6).alias(
            "chi2"
        )
    )
    dof = (
        top.agg(F.count(F.lit(1)).alias("_nt"))
        .crossJoin(col.agg(F.count(F.lit(1)).alias("_nc")))
        .select(((F.col("_nt") - 1) * (F.col("_nc") - 1)).cast("long").alias("dof"))
    )
    return chi2.crossJoin(dof)


@register(
    "substring_dedup_spans",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 19, 0))) AS p
      FROM documents WHERE length(text) >= 20
    ), seeds AS (
      SELECT doc_id AS d, p, substr(text, p, 20) AS g FROM pos
    ), keep AS (
      SELECT g FROM seeds GROUP BY g
      HAVING count(DISTINCT d) BETWEEN 2 AND 8
    ), w AS (
      SELECT s.g, s.d, s.p FROM seeds s JOIN keep USING (g)
    ), pair_seeds AS (
      SELECT a.d AS doc_a, b.d AS doc_b, a.p AS pos_a, b.p AS pos_b,
             a.p - b.p AS diag
      FROM w a JOIN w b USING (g)
      WHERE a.d < b.d
    ), runs AS (
      SELECT doc_a, doc_b, diag, pos_a, pos_b,
             pos_a - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
             ) AS island
      FROM pair_seeds
    ), spans AS (
      SELECT CAST(doc_a AS BIGINT) AS doc_a,
             CAST(doc_b AS BIGINT) AS doc_b,
             CAST(MIN(pos_a) AS BIGINT) AS start_a,
             CAST(MIN(pos_b) AS BIGINT) AS start_b,
             CAST(MAX(pos_a) - MIN(pos_a) + 20 AS BIGINT) AS span_len
      FROM runs GROUP BY doc_a, doc_b, diag, island
    )
    SELECT * FROM spans WHERE span_len >= 40
    ORDER BY span_len DESC, doc_a, doc_b, start_a, start_b
    LIMIT 20
    """,
)
def substring_dedup_spans(spark, sf_dir):
    """EXACT SUBSTRING dedup (round 14 — the Lee-et-al. cross-doc
    verbatim-span family, r13 verdict ask #6): the 20 longest verbatim
    character spans (>= 40 chars, maximal) duplicated between any two
    documents, found by `operators/substring.verbatim_span_pairs` —
    seed 20-grams, df-capped (<= 8 docs) inverted-index pair join,
    gaps-and-islands maximal diagonal runs. The oracle replays the
    identical algebra in SQL, so the operator's exactness (every
    duplicated span >= min_len appears, with exact boundaries) is
    hash-checked against an independent engine, not just unit-tested.
    Deterministic total order: (span_len DESC, ids, starts) is a key."""
    from wnv_etl_lab2_spark.operators.substring import verbatim_span_pairs

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    spans = verbatim_span_pairs(d, k=20, min_len=40, max_df=8)
    return spans.orderBy(
        F.col("span_len").desc(), "doc_a", "doc_b", "start_a", "start_b"
    ).limit(20)


@register(
    "substring_dedup_yield",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 19, 0))) AS p
      FROM documents WHERE length(text) >= 20
    ), seeds AS (
      SELECT doc_id AS d, p, substr(text, p, 20) AS g FROM pos
    ), keep AS (
      SELECT g FROM seeds GROUP BY g
      HAVING count(DISTINCT d) BETWEEN 2 AND 8
    ), w AS (
      SELECT s.g, s.d, s.p FROM seeds s JOIN keep USING (g)
    ), pair_seeds AS (
      SELECT a.d AS doc_a, b.d AS doc_b, a.p AS pos_a, b.p AS pos_b,
             a.p - b.p AS diag
      FROM w a JOIN w b USING (g)
      WHERE a.d < b.d
    ), runs AS (
      SELECT doc_a, doc_b, diag, pos_a, pos_b,
             pos_a - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
             ) AS island
      FROM pair_seeds
    ), spans AS (
      SELECT doc_b, MIN(pos_b) AS s,
             MIN(pos_b) + MAX(pos_a) - MIN(pos_a) + 20 AS e
      FROM runs GROUP BY doc_a, doc_b, diag, island
      HAVING MAX(pos_a) - MIN(pos_a) + 20 >= 40
    ), marked AS (
      SELECT doc_b, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
               PARTITION BY doc_b ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS brk
      FROM spans
    ), grp AS (
      SELECT doc_b, s, e,
             SUM(brk) OVER (PARTITION BY doc_b ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
      FROM marked
    ), merged AS (
      SELECT doc_b, gid, MIN(s) AS ms, MAX(e) AS me
      FROM grp GROUP BY doc_b, gid
    ), removed AS (
      SELECT doc_b AS doc_id, CAST(SUM(me - ms) AS BIGINT) AS removed_chars
      FROM merged GROUP BY doc_b
    )
    SELECT r.doc_id,
           CAST(LENGTH(d.text) AS BIGINT) AS orig_chars,
           r.removed_chars,
           CAST(LENGTH(d.text) - r.removed_chars AS BIGINT) AS kept_chars
    FROM removed r JOIN documents d ON d.doc_id = r.doc_id
    ORDER BY r.doc_id
    """,
)
def substring_dedup_yield(spark, sf_dir):
    """The REMOVAL half of exact substring dedup as a driver-verified
    query (round 14 — registry face of
    `operators/substring.strip_verbatim_spans`): find every cross-doc
    verbatim span (same parameters as `substring_dedup_spans`), strip
    each from its LATER doc (keep-first), and report per affected doc
    (original chars, removed chars, kept chars). The oracle computes
    the expected removal INDEPENDENTLY — the merged-interval union
    length per doc via SQL gaps-and-islands over the span intervals —
    so the JVM `aggregate` stitch (cursor walk, overlap merging, 1-
    based substring arithmetic) is hash-checked against set algebra it
    shares no code with. Off-by-one in the stitch = hash mismatch."""
    from wnv_etl_lab2_spark.operators.substring import (
        strip_verbatim_spans,
        verbatim_span_pairs,
    )

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    spans = verbatim_span_pairs(d, k=20, min_len=40, max_df=8)
    stripped = strip_verbatim_spans(d, spans).select(
        "doc_id", F.length("text").alias("_kept")
    )
    return (
        d.select("doc_id", F.length("text").alias("_orig"))
        .join(stripped, "doc_id")
        .where(F.col("_kept") < F.col("_orig"))
        .select(
            "doc_id",
            F.col("_orig").cast("long").alias("orig_chars"),
            (F.col("_orig") - F.col("_kept")).cast("long").alias("removed_chars"),
            F.col("_kept").cast("long").alias("kept_chars"),
        )
        .orderBy("doc_id")
    )


@register(
    "unigram_seed_pieces",
    oracle="""
    WITH w AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    p AS (
      SELECT UNNEST(flatten(list_transform(
                 range(1, CAST(LENGTH(w) AS BIGINT) + 1),
                 s -> list_transform(
                     range(CAST(s AS BIGINT),
                           LEAST(CAST(LENGTH(w) AS BIGINT), s + 5) + 1),
                     e -> substr(w, CAST(s AS BIGINT),
                                 CAST(e - s + 1 AS BIGINT)))))) AS piece,
             n
      FROM w
    )
    SELECT piece, CAST(SUM(n) AS BIGINT) AS freq
    FROM p GROUP BY piece
    ORDER BY freq DESC, piece ASC LIMIT 30
    """,
)
def unigram_seed_pieces(spark, sf_dir):
    """Unigram-LM tokenizer SEED-VOCABULARY audit (round 15 — registry
    face of `operators/unigram.seed_piece_frequencies`, r14 verdict ask
    #5): the corpus collapses to its (word, count) table (the one
    corpus-sized pass the trainer ever makes), every substring up to 6
    characters of every distinct word explodes JVM-side
    (sequence/transform/substring inside whole-stage codegen — the
    piece-candidate enumeration SentencePiece does with a suffix
    array), and the count-weighted piece frequencies reduce in one
    combinable sum. Top 30 by (freq desc, piece asc). The oracle
    replays the same explosion with DuckDB list comprehensions, so the
    whole distributed seed stage — tokenize, explode, weight, reduce —
    is hash-checked. EM training over this artifact is driver-side and
    pinned against an independent reference in tests/test_unigram.py."""
    from wnv_etl_lab2_spark.operators.unigram import seed_piece_frequencies

    d = load_table(spark, "documents", sf_dir)
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        seed_piece_frequencies(words, max_piece_len=6)
        .orderBy(F.col("freq").desc(), F.col("piece").asc())
        .limit(30)
    )


@register(
    "tokenizer_roundtrip",
    oracle="""
    WITH base AS (
        SELECT doc_id, lang,
               TRIM(REGEXP_REPLACE(text, ' +', ' ', 'g')) AS norm
        FROM documents
    ), rows_ AS (
        SELECT lang,
               1 + (doc_id % 3) AS k,
               LENGTH(norm) AS norm_len
        FROM base WHERE LENGTH(norm) > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(k * 8 + norm_len) AS BIGINT) AS total_len,
           CAST(SUM(k) AS BIGINT) AS total_specials
    FROM rows_ GROUP BY lang
    """,
)
def tokenizer_roundtrip(spark, sf_dir):
    """Tokenizer PRODUCTION surface end-to-end (round 16 — registry
    face of `operators/tokenizer.py`, r15 verdict "what's missing"
    #5): train a unigram-LM vocabulary on the corpus, wrap it with a
    special token, SAVE the artifact and LOAD it back (the cross-
    session round-trip the trainers lacked), then encode every
    document — prefixed with 1-3 copies of the special token — and
    DECODE the token stream back. The lossless contract (specials
    never segmented, out-of-alphabet characters byte-fall-back to
    ``<0xNN>`` pieces and reassemble) means decode(encode(x)) == x, so
    the emitted per-language totals — documents, decoded LENGTHS, and
    specials counted FROM THE TOKEN STREAM — are computed entirely
    through the tokenizer path, while the oracle computes the same
    numbers arithmetically from the raw text. Any drift (a split
    special, a dropped byte, a lost word boundary) changes a length
    and hash-mismatches. Spark shape: training touches the corpus once
    (bounded word artifact), the apply is one Arrow crossing with the
    loaded artifact broadcast by closure."""
    import os
    import shutil
    import tempfile

    from wnv_etl_lab2_spark.operators.tokenizer import (
        Tokenizer,
        roundtrip_udf,
    )
    from wnv_etl_lab2_spark.operators.unigram import train_unigram

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "text"
    )
    base = d.select(
        "doc_id",
        "lang",
        F.trim(F.regexp_replace("text", " +", " ")).alias("norm"),
    ).where(F.length("norm") > 0)
    inp = base.select(
        "lang",
        F.concat(
            F.expr("repeat('<|doc|> ', CAST(1 + doc_id % 3 AS INT))"),
            F.col("norm"),
        ).alias("inp"),
    )
    vocab = train_unigram(
        d, vocab_size=200, iters=2, max_piece_len=4,
        seed_size=800, vocab_limit=3000,
    )
    root = tempfile.mkdtemp(prefix="wnv_tok_rt_")
    try:
        path = os.path.join(root, "uni.tokenizer.json")
        Tokenizer.from_unigram(vocab, special_tokens=["<|doc|>"]).save(path)
        tok = Tokenizer.load(path)  # the artifact a NEW session consumes
        roundtrip = roundtrip_udf(tok.to_dict(), "<|doc|>")

        r = inp.select("lang", roundtrip(F.col("inp")).alias("_t")).select(
            "lang", "_t.ok", "_t.dec_len", "_t.n_spec"
        )
        bad = r.where(~F.col("ok")).count()
        if bad:
            raise AssertionError(
                f"{bad} documents failed decode(encode(x)) == x"
            )
        return r.groupBy("lang").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dec_len").cast("long").alias("total_len"),
            F.sum("n_spec").cast("long").alias("total_specials"),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
