"""Table maintenance: small-file compaction.

The operational problem every long-running ingestion hits: streaming
micro-batches, per-task writes, and incremental appends leave
thousands of KB-sized files per partition, and at 100 TB the NameNode/
object-store listing plus per-file open cost dominates scan time long
before the bytes do. The fix is periodic rewrite into target-sized
files — what Delta's OPTIMIZE / Iceberg's rewrite_data_files do; this
is the format-agnostic DataFrame form (no lakehouse jars in this
image, see README).

Sizing is measured, not guessed: the current bytes-on-disk decide the
output file count, so the caller states a target FILE SIZE (the thing
scan throughput actually depends on) instead of a magic partition
number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str, suffix: str = ".parquet") -> int:
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(suffix) and not f.startswith(("_", "."))
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` with files sized close to
    ``target_file_bytes``; returns the output file count. Compaction
    writes to a NEW path and the caller swaps atomically (rename /
    catalog pointer flip) — rewriting in place would break concurrent
    readers mid-job.

    ``sort_within_by`` optionally sorts rows inside each output file
    (no global sort, no extra shuffle beyond the coalescing
    repartition) — cheap data clustering so min/max footer stats prune
    better on the named columns.
    """
    n_bytes = _tree_bytes(src_path)
    n_files = max(1, round(n_bytes / target_file_bytes))
    df = spark.read.parquet(src_path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_path)
    return data_file_count(dst_path)
