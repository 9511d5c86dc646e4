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

from pyspark.sql import SparkSession


def _list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(name, bytes) of every data file under ``path``, resolved
    through Hadoop's FileSystem API so the SAME code sizes local dirs,
    hdfs:// and s3a:// tables — an ``os.walk`` here silently returned
    0 bytes for any non-local URI, which made compaction rewrite the
    whole dataset through ``repartition(1)``: one task, one giant
    file, exactly the failure the module exists to prevent."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise ValueError(f"compaction source does not exist: {path}")
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)  # recursive
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            out.append((name, int(st.getLen())))
    return out


def _tree_bytes(spark: SparkSession, path: str) -> int:
    return sum(b for _n, b in _list_data_files(spark, path))


def data_file_count(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> int:
    return sum(1 for n, _b in _list_data_files(spark, path) if n.endswith(suffix))


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
    n_bytes = _tree_bytes(spark, src_path)
    n_files = max(1, round(n_bytes / target_file_bytes))
    df = spark.read.parquet(src_path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_path)
    return data_file_count(spark, dst_path)
