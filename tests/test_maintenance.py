"""Small-file compaction: many tiny files in, target-sized files out,
bytes and row-values preserved, optional within-file clustering."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.sources.maintenance import compact_parquet, data_file_count


def test_compaction_reduces_file_count_and_preserves_rows(spark, tmp_path, sf_dir):
    src = str(tmp_path / "fragmented")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(64).write.parquet(src)  # simulate micro-batch litter
    assert data_file_count(spark, src) >= 32

    dst = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert n_out < data_file_count(spark, src)
    a = spark.read.parquet(src).orderBy("doc_id").toPandas()
    b = spark.read.parquet(dst).orderBy("doc_id").toPandas()
    assert a.equals(b)


def test_compaction_sort_within_clusters_footer_ranges(spark, tmp_path, sf_dir):
    """sortWithinPartitions must actually order rows inside each output
    file so parquet min/max footers become selective."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "frag2")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(16).write.parquet(src)
    dst = str(tmp_path / "sorted")
    compact_parquet(
        spark, src, dst, target_file_bytes=10 * 1024 * 1024, sort_within_by=["doc_id"]
    )
    for root, _dirs, files in os.walk(dst):
        for fname in files:
            if fname.endswith(".parquet") and not fname.startswith(("_", ".")):
                col = pq.read_table(os.path.join(root, fname), columns=["doc_id"])
                vals = col.column("doc_id").to_pylist()
                assert vals == sorted(vals), f"{fname} not sorted within file"
