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
from wnv_etl_lab2_spark.sources.catalog import load_table

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
