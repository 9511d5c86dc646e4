"""Z-order layout (sources/layout.py): clustering must (a) preserve
the table bit-for-bit, and (b) make BOTH clustered columns prunable
from the written files' real parquet footers — the property linear
sort orders only give their first key."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.sources.catalog import load_table
from wnv_etl_lab2_spark.sources.layout import (
    file_minmax_stats,
    files_matching,
    morton_code,
    write_zordered,
)


def test_morton_code_interleaves_exactly(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (2**21 - 1, 2**21 - 1)], "a long, b long"
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", morton_code(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }

    def py_morton(a, b):
        z = 0
        for i in range(21):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == py_morton(a, b), (a, b)


def test_zorder_preserves_content_and_prunes_both_dims(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zordered(docs, zpath, ("n_chars", "doc_id"), n_files=8)
    # the linear baseline: sorted by n_chars only, same file count
    (
        docs.repartitionByRange(8, "n_chars")
        .sortWithinPartitions("n_chars")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # (a) content identical under an order-insensitive content hash
    def content_hash(path):
        return (
            spark.read.parquet(path)
            .select(F.md5(F.concat_ws("|", "doc_id", "lang", "source", "n_chars")).alias("h"))
            .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")))
            .collect()[0][0]
        )

    assert content_hash(zpath) == content_hash(lpath)
    assert spark.read.parquet(zpath).count() == docs.count()

    # (b) footer-level pruning: a narrow predicate on EACH clustered
    # dimension must skip files under the z-layout. The linear layout
    # prunes its sort key but NOT the second dimension — every file
    # spans nearly the full doc_id range.
    lo_id, hi_id = 0, 24  # narrow doc_id slice
    z_id = file_minmax_stats(zpath, "doc_id")
    l_id = file_minmax_stats(lpath, "doc_id")
    z_hit = len(files_matching(z_id, lo_id, hi_id))
    l_hit = len(files_matching(l_id, lo_id, hi_id))
    assert z_hit < len(z_id), "z-order layout must skip files on the second dimension"
    # the linear layout's files each span ~the full doc_id range (its
    # non-sort key), so the z-layout must touch strictly fewer files
    # for the same slice (individual linear files can still miss a
    # narrow slice by luck — compare, don't absolutize)
    assert z_hit < l_hit, (z_hit, l_hit)

    # both layouts prune the first dimension
    z_nc = file_minmax_stats(zpath, "n_chars")
    nc_vals = sorted(r.n_chars for r in docs.select("n_chars").collect())
    lo_nc, hi_nc = nc_vals[0], nc_vals[len(nc_vals) // 10]
    assert len(files_matching(z_nc, lo_nc, hi_nc)) < len(z_nc)
