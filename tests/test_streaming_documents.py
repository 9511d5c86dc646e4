"""Streaming curation must reproduce the batch curation answer when
the whole corpus replays through the stream, and must deduplicate
across micro-batch boundaries (the property a per-batch map cannot
have)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions import quality as Q
from wnv_etl_lab2_spark.sources.catalog import load_table
from wnv_etl_lab2_spark.streaming.documents import (
    read_documents_stream,
    stage_documents_for_streaming,
    streaming_curation,
)


@pytest.fixture()
def docs_path(spark, sf_dir, tmp_path):
    return stage_documents_for_streaming(
        spark, sf_dir, str(tmp_path / "docs_stream"), n_files=4
    )


def _run_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_curation_matches_batch(spark, sf_dir, docs_path):
    """Replaying the corpus through the stream keeps exactly the
    batch-curated content set: same kept digests, same count (the
    surviving doc_id per digest may differ — micro-batch arrival
    order vs min-id — so the CONTENT set is the contract)."""
    out = _run_to_memory(
        spark,
        streaming_curation(read_documents_stream(spark, docs_path)),
        "stream_curation",
    ).toPandas()
    batch = (
        load_table(spark, "documents", sf_dir)
        .where(Q.quality_keep())
        .select(F.md5("text").alias("digest"))
        .distinct()
        .toPandas()
    )
    assert set(out.digest) == set(batch.digest)
    assert len(out) == len(batch)  # one survivor per digest
    # every surviving row passes the same quality predicate
    assert len(out) > 0


def test_streaming_curation_dedups_across_batches(spark, tmp_path):
    """Two files, same content: the second micro-batch's copy must be
    dropped by the keyed state, proving dedup spans batch boundaries."""
    # mean word length must land in [4.0, 5.0] for quality_keep
    base = "the torch spark query table always " * 8
    a = spark.createDataFrame(
        [(1, base, "en", "srcA", len(base))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    b = spark.createDataFrame(
        [(2, base, "en", "srcB", len(base)), (3, base + "tails ", "en", "srcB", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "two_batches")
    a.write.mode("overwrite").parquet(p)
    b.write.mode("append").parquet(p)
    out = _run_to_memory(
        spark,
        streaming_curation(read_documents_stream(spark, p)),
        "stream_curation_2b",
    ).toPandas()
    # both texts pass quality; the duplicate content keeps ONE row
    assert sorted(out.digest.value_counts().tolist()) == [1, 1]
