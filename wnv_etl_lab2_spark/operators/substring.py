"""EXACT SUBSTRING deduplication (round 14 — r13 verdict ask #6): the
Lee-et-al. "Deduplicating Training Data Makes Language Models Better"
dedup family — find (and strip) LONG VERBATIM character spans
duplicated BETWEEN documents, regardless of how few documents share
them. Doc-level exact/near dedup misses these (two mostly-different
docs sharing one copied paragraph), and the frequency-based
`repeated_span_removal` only fires above a df threshold; this operator
is the per-pair exact complement LLM pipelines run before training.

Method — seed-gram diagonal runs instead of a suffix array, because
the decomposition is pure DataFrame algebra with the same bucketed
shape as the repo's other pair operators (never all-pairs):

1. SEEDS: every character ``k``-gram of every doc (position-stamped).
   A shared span of length L >= k contributes exactly L-k+1 seed
   matches on one (doc_a, doc_b) DIAGONAL (pos_a - pos_b constant).
2. DF CAP: grams present in more than ``max_df`` distinct docs are
   stop-grams (boilerplate the caller excludes by contract — same
   stance as the shingle backbone's cap); grams in a single doc
   cannot witness a cross-doc span and drop too. The cap bounds the
   candidate join at cap^2 DOC pairs per gram — but occurrences
   WITHIN a doc multiply on top (a gram repeated o times in each of
   two docs seeds o^2 pairs), so pathological repetition runs (huge
   whitespace/boilerplate blocks) need the ``max_occ_per_doc`` knob.
3. PAIR SEEDS: self-equi-join on the gram (doc_a < doc_b) — an
   inverted-index bucket join, executor-parallel, bounded by the cap.
4. MAXIMAL RUNS: per (doc_a, doc_b, diagonal), consecutive seed
   positions form islands (pos - row_number is the standard
   gaps-and-islands key); each island IS a maximal common substring,
   with length = (max_pos - min_pos) + k. Emit islands with length
   >= ``min_len``.

This is EXACT for every duplicated span of length >= min_len >= k
(each such span yields an unbroken seed run; the df cap is part of
the declared semantics, exactly like the shingle backbone). SQL-
expressible end to end, so the registered query carries a DuckDB
oracle replaying the same algebra.

Scale shape (100 TB): the seed explosion is O(total chars) rows —
this family's irreducible floor, the same class as the quarantined
exact-pair queries, and the reason suffix-array dedup jobs are their
own pipeline stage in production. Mitigations that keep it runnable:
the df pass can shuffle xxhash64(gram) digests instead of 20-byte
strings; seeds can stride (every a-th gram) at the cost of detecting
only spans >= k + a - 1; and the candidate join is cap-bounded per
gram. The pair seeds themselves shuffle only (ids, positions, gram).
Do not lift the cap, and keep min_len >> k so emitted spans stay
sparse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def verbatim_span_pairs(
    docs: DataFrame,
    k: int = 20,
    min_len: int = 40,
    max_df: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    prehash: bool = False,
    max_occ_per_doc: int | None = None,
) -> DataFrame:
    """All maximal cross-doc verbatim spans of length >= ``min_len``
    (witnessed by seed grams with document frequency <= ``max_df``) as
    ``(doc_a, doc_b, start_a, start_b, span_len)`` with doc_a < doc_b
    and 1-based character starts.

    ``prehash=True`` is the 100 TB knob: the df pass and the witness
    join key on ``xxhash64(gram)`` (8 bytes) instead of the k-char
    gram string, cutting the heaviest shuffle's key width ~60%. Pair
    seeds still require REAL gram equality (the pair join filters on
    the strings), so a hash collision can never fabricate a span; the
    only deviation from the exact default is the df CAP being counted
    per hash bucket — a collision could merge two grams' counts past
    ``max_df`` and drop both (a ~2^-64-probability false negative).
    The default stays oracle-exact; pytest pins prehash == exact on
    the test corpus.

    ``max_occ_per_doc`` caps how many occurrences of one gram PER DOC
    enter the pair join (keeping the earliest positions) — the guard
    against degenerate repetition runs, where a gram repeated o times
    in each of two docs seeds o^2 candidate pairs regardless of the
    df cap. Spans witnessed only by occurrences past the cap go
    undetected (declared approximation; None = exact, the default —
    the registered oracle query runs exact)."""
    if min_len < k:
        raise ValueError(f"min_len ({min_len}) must be >= k ({k})")
    seeds = docs.select(
        F.col(id_col).alias("_d"),
        F.col(text_col).alias("_t"),
    ).where(F.length("_t") >= k).select(
        "_d",
        F.expr(f"explode(sequence(1, length(_t) - {k - 1}))").alias("_p"),
        "_t",
    ).select(
        "_d", "_p", F.expr(f"substring(_t, _p, {k})").alias("_g")
    ).localCheckpoint()
    # ^ the seed explosion runs ONCE: the df pass AND the witness join
    # both consume it, and recomputing the explode + substring over
    # the corpus per consumer tripled the wall time (measured). The
    # checkpoint is O(total chars) rows — this operator's declared
    # floor either way; at cluster scale the same role is played by a
    # persisted StorageLevel.DISK_ONLY seed table.
    # Stop-gram cap + cross-doc witness filter — on the GRAM STRING by
    # default (the oracle's exact universe), or on its xxhash64 digest
    # under ``prehash`` (see docstring)
    key = "_g"
    if prehash:
        seeds = seeds.withColumn("_h", F.xxhash64("_g"))
        key = "_h"
    keep = (
        seeds.groupBy(key)
        .agg(F.count_distinct("_d").alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select(key)
    )
    witnessed = seeds.join(keep, key)
    if prehash:
        witnessed = witnessed.drop("_h")
    if max_occ_per_doc is not None:
        occ = Window.partitionBy("_d", "_g").orderBy("_p")
        witnessed = (
            witnessed.withColumn("_occ", F.row_number().over(occ))
            .where(F.col("_occ") <= max_occ_per_doc)
            .drop("_occ")
        )
    a = witnessed.select(
        F.col("_g"), F.col("_d").alias("doc_a"), F.col("_p").alias("pos_a")
    )
    b = witnessed.select(
        F.col("_g"), F.col("_d").alias("doc_b"), F.col("_p").alias("pos_b")
    )
    pair_seeds = a.join(b, "_g").where(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b", "pos_a", "pos_b",
        (F.col("pos_a") - F.col("pos_b")).alias("_diag"),
    )
    w = Window.partitionBy("doc_a", "doc_b", "_diag").orderBy("pos_a")
    runs = pair_seeds.withColumn(
        "_island", F.col("pos_a") - F.row_number().over(w)
    )
    return (
        runs.groupBy("doc_a", "doc_b", "_diag", "_island")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + F.lit(k)).alias("span_len"),
        )
        .where(F.col("span_len") >= min_len)
        .select(
            F.col("doc_a").cast("long"),
            F.col("doc_b").cast("long"),
            F.col("start_a").cast("long"),
            F.col("start_b").cast("long"),
            F.col("span_len").cast("long"),
        )
    )


def strip_verbatim_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove duplicated spans from the LATER document of each pair
    (keep-first policy — doc_a < doc_b, so doc_a keeps its copy): for
    every row of ``spans``, cut ``[start_b, start_b + span_len)`` out
    of doc_b's text. Overlapping spans merge naturally (the rebuild
    walks a cursor that only moves forward). Pure JVM expression work:
    spans per doc collect into a sorted array column (bounded by the
    finder's cap + min_len sparsity, not corpus size) and one
    ``aggregate`` stitches the kept segments — no Python, no UDF.
    Returns ``docs`` with ``text`` rewritten (other columns intact);
    docs with no spans pass through untouched."""
    per_doc = spans.groupBy(F.col("doc_b").alias(id_col)).agg(
        F.sort_array(
            F.collect_list(F.struct("start_b", "span_len"))
        ).alias("_ivs")
    )
    out_cols = docs.columns
    return (
        docs.join(per_doc, id_col, "left")
        .withColumn(
            text_col,
            F.when(F.col("_ivs").isNull(), F.col(text_col)).otherwise(
                F.expr(
                    f"""
                    aggregate(
                      _ivs,
                      struct(CAST(1 AS BIGINT) AS pos, CAST('' AS STRING) AS acc),
                      (st, iv) -> struct(
                        greatest(iv.start_b + iv.span_len, st.pos) AS pos,
                        concat(
                          st.acc,
                          substring({text_col}, CAST(st.pos AS INT),
                                    CAST(greatest(iv.start_b - st.pos, 0) AS INT))
                        ) AS acc
                      ),
                      st -> concat(
                        st.acc,
                        substring({text_col}, CAST(st.pos AS INT),
                                  length({text_col}))
                      )
                    )
                    """
                )
            ),
        )
        .select(*out_cols)
    )
