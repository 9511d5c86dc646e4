"""The curation pipeline as an EXECUTABLE Pipeline composition.

`queries/similarity_q.corpus_curation_stats` is the audited yield
SHEET; this module is the corresponding data PRODUCT: the same
near-dup canonicalization and quality rules, composed through the
engine's public Source -> Transform* -> Sink protocol (reference
O21/O23, `/root/reference/SpatialETL_Lab2.py:1-17` template method)
and writing the surviving documents out. Stage order is
dedup-then-prune, matching the stats query: canonicalization runs on
the FULL corpus (so the surviving representative of a duplicate group
does not depend on which members pass quality), then the rule filter.

Laziness caveat: the OUTPUT plan is lazy (the sink action streams the
curated corpus), but BUILDING it is not free — `neardup_prune` calls
`connected_components`, whose per-round convergence check runs the
MinHash pair pipeline and label propagation eagerly (a driver-side
count per round is inherent to the iterative algorithm). Build once
and reuse the returned DataFrame; Catalyst still optimizes the final
plan across stage boundaries (the quality predicate pushes below the
dedup anti-join's probe side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions import quality as Q
from wnv_etl_lab2_spark.operators.dedup import connected_components, minhash_lsh_pairs
from wnv_etl_lab2_spark.pipeline import Pipeline, Source
from wnv_etl_lab2_spark.sources.catalog import load_table


def neardup_prune(docs: DataFrame) -> DataFrame:
    """Drop every non-canonical member of a near-dup component (the
    component's min doc_id survives). The non-canonical set is tiny
    relative to the corpus, so the anti-join broadcasts it — the
    corpus side never shuffles."""
    # expand_members=False: components only need the reduced
    # rep-level edge set (star edges reach every member) — skips the
    # member fan-out expansions this consumer never reports.
    pairs = minhash_lsh_pairs(
        docs, num_hashes=32, bands=16, threshold=0.5, expand_members=False
    )
    comp = connected_components(pairs)
    losers = comp.where(F.col("comp_id") != F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(F.broadcast(losers), "doc_id", "left_anti")


def quality_filter(docs: DataFrame) -> DataFrame:
    """Keep documents passing the shared Gopher-style rule set."""
    return docs.where(Q.quality_keep())


def image_neardup_prune(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    score_col: str | None = None,
    max_hamming: int = 3,
) -> DataFrame:
    """Multimodal curation stage (round 11, r10 verdict #7): keep the
    BEST member of every image near-dup group, drop the rest — the
    image twin of `neardup_prune`. Groups come from perceptual dHash
    banding (`operators/multimodal.image_neardup_pairs`, exact recall
    at ``max_hamming`` via pigeonhole bands — never all-pairs) closed
    under `connected_components`; "better" is the highest
    ``score_col`` (default: payload byte length, the deterministic
    more-detail proxy), ties broken to the lowest id. Undecodable
    payloads never hash, never pair, and therefore always survive —
    corrupt media is data to count, not rows to silently lose.

    Scale shape: hashing is one Arrow crossing over (id, payload);
    pairs are band-bucketed; components and the per-component window
    run over PAIR MEMBERS only (tiny vs the corpus); the loser set
    broadcasts into a left-anti join, so the media corpus itself never
    shuffles."""
    from pyspark.sql import Window as W

    from wnv_etl_lab2_spark.operators.dedup import connected_components
    from wnv_etl_lab2_spark.operators.multimodal import (
        image_dhash,
        image_neardup_pairs,
    )

    hashes = image_dhash(media, id_col=id_col, payload_col=payload_col)
    pairs = image_neardup_pairs(hashes, max_hamming=max_hamming)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    score = F.col("_score") if score_col is None else F.col(score_col)
    members = media.join(
        F.broadcast(comp.withColumnRenamed("id", id_col)), id_col
    )
    if score_col is None:
        members = members.withColumn("_score", F.length(F.col(payload_col)))
    ranked = members.withColumn(
        "_rn",
        F.row_number().over(
            W.partitionBy("comp_id").orderBy(score.desc(), F.col(id_col).asc())
        ),
    )
    losers = ranked.where(F.col("_rn") > 1).select(id_col)
    return media.join(F.broadcast(losers), id_col, "left_anti")


def image_neardup_survivors(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
) -> DataFrame:
    """GREEDY image near-dup rule — the batch twin of the streaming
    image curation (`streaming/documents.image_neardup_batch_processor`):
    an image survives iff NO smaller-id image is within ``max_hamming``
    bits of its dHash, kept or not (the same "any smaller id"
    semantics as `minhash_band_survivors`, which is what an
    arrival-ordered stream can enforce without retraction). Replaying
    an id-ordered corpus through the streaming processor reproduces
    this set exactly (pinned in tests/test_streaming_documents.py)."""
    from wnv_etl_lab2_spark.operators.multimodal import (
        image_dhash,
        image_neardup_pairs,
    )

    hashes = image_dhash(media, id_col=id_col, payload_col=payload_col)
    pairs = image_neardup_pairs(hashes, max_hamming=max_hamming)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return media.join(F.broadcast(losers), id_col, "left_anti")


def documents_source(sf_dir: str) -> Source:
    return lambda spark: load_table(spark, "documents", sf_dir)


def curation_pipeline(sf_dir: str) -> Pipeline:
    """documents -> near-dup prune -> quality filter, as one plan."""
    return Pipeline(
        source=documents_source(sf_dir),
        transforms=[neardup_prune, quality_filter],
        name="corpus-curation",
    )


def curated_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated-corpus DataFrame. The returned plan is lazy, but
    building it materializes the dedup component table (see module
    docstring) — call once, reuse the result."""
    return curation_pipeline(sf_dir).build(spark)


def source_quantile_keep(
    docs: DataFrame,
    score_col: str,
    source_col: str = "source",
    keep_frac: float = 0.5,
    accuracy: int = 10000,
) -> DataFrame:
    """The PRODUCTION path of per-source score calibration
    (`queries/curation_q.source_quantile_normalize` is the
    oracle-checkable exact semantics): keep the top ``keep_frac`` of
    every source by replacing the exact per-source percent-rank window
    with ONE approx-quantile boundary per source.

    Why this is the 100 TB form: the exact window sorts every source's
    scores on a single reducer chain (per-source sort = the hazard the
    exact query's docstring names). Here the boundary comes from
    ``approx_percentile`` — a mergeable KLL-style sketch, so the
    aggregation is partial+final combinable (map-side partials, one
    tiny final merge per source); the |sources|-row boundary table
    broadcasts; and the keep test is a MAP-SIDE comparison fused into
    the scan. Nothing but sketch partials ever crosses the network,
    and no total order is ever materialized.

    Accuracy contract: ``accuracy`` is the sketch's inverse relative
    rank error (Spark guarantees rank error <= 1/accuracy), so the
    keep-set disagreement vs the exact form is confined to a
    ~1/accuracy-wide band around the boundary — pinned by
    tests/test_calibration.py at >= 99% keep-set agreement."""
    cut = docs.groupBy(source_col).agg(
        F.expr(
            f"approx_percentile({score_col}, {1.0 - keep_frac}, {accuracy})"
        ).alias("_cut")
    )
    return (
        docs.join(F.broadcast(cut), source_col)
        .where(F.col(score_col) >= F.col("_cut"))
        .drop("_cut")
    )
