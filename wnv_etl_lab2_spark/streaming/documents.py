"""Structured Streaming over the documents corpus: incremental
curation.

The batch curation pipeline (`curation.py`: quality rules + dedup) is
re-expressed as a STREAM over arriving document files — the shape a
continuously-crawling corpus actually has. Exactly the same quality
predicate (`functions/quality.py`) and the same content-digest dedup
key as the batch path, so replaying the whole corpus through the
stream must reproduce the batch answer (asserted in
tests/test_streaming_documents.py).

At 100 TB the file source becomes Kafka/object-store notifications and
the memory sink a parquet/Delta append — the logical plan is
identical; only source/sink bindings change (same argument as
streaming/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stage_documents_for_streaming(
    spark: SparkSession, sf_dir: str, out_path: str, n_files: int = 4
) -> str:
    """Re-stage the documents table as ``n_files`` parquet files so the
    file source replays them as distinct micro-batches (maxFilesPerTrigger
    below)."""
    from wnv_etl_lab2_spark.sources.catalog import load_table

    load_table(spark, "documents", sf_dir).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_path)
    return out_path


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over staged documents parquet, one file per
    micro-batch (declared schema — streaming sources never infer)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def streaming_curation(docs: DataFrame) -> DataFrame:
    """Incremental curation: quality-rule filter, then exact dedup on
    the content digest via ``dropDuplicates`` keyed state — the first
    arrival of each content survives, later copies (same or later
    micro-batch) are dropped. State grows with DISTINCT content, the
    same asymptotic cost as the batch dedup index; a production stream
    bounds it with ``dropDuplicatesWithinWatermark`` over an ingest
    timestamp once re-crawl horizons apply."""
    from wnv_etl_lab2_spark.functions import quality as Q

    kept = docs.where(Q.quality_keep())
    return kept.withColumn("digest", F.md5("text")).dropDuplicates(["digest"])
