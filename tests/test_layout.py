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


def test_morton_n_columns_and_three_key_zorder_skipping(spark, tmp_path):
    """N-column Morton (round 11): the 3-key interleave clusters ALL
    three columns at once — after OPTIMIZE ZORDER BY (a, b, c) +
    ANALYZE, a range probe on EACH of the three columns individually
    prunes files (min/max stays narrow per key), and the code rejects
    interleaves that would overflow a BIGINT."""
    import pytest
    from pyspark.sql import functions as F

    from wnv_etl_lab2_spark.sources.layout import morton_code_n
    from wnv_etl_lab2_spark.sources.versioned import (
        collect_stats,
        create_table,
        optimize_table,
        read_table,
        read_table_pruned,
    )

    # overflow guard
    with pytest.raises(ValueError, match="BIGINT"):
        morton_code_n([F.lit(0)] * 4, bits=16)

    # bit layout: 3 columns, bit n*i+j comes from column j's bit i
    row = (
        spark.range(1)
        .select(
            morton_code_n([F.lit(1).cast("bigint"), F.lit(2).cast("bigint"),
                           F.lit(4).cast("bigint")], bits=3).alias("z")
        )
        .head()
    )
    # a=0b001 -> bit 0; b=0b010 -> bit 3*1+1=4; c=0b100 -> bit 3*2+2=8
    assert row.z == (1 << 0) + (1 << 4) + (1 << 8)

    tbl = str(tmp_path / "tbl")
    rows = [(i, (i * 7) % 1000, (i * 13) % 1000, (i * 29) % 1000) for i in range(4000)]
    create_table(
        spark.createDataFrame(rows, "id long, a long, b long, c long").repartition(8),
        tbl,
    )
    optimize_table(spark, tbl, target_files=8, zorder_by=("a", "b", "c"))
    collect_stats(spark, tbl, ["a", "b", "c"])
    total = len(read_table(spark, tbl).inputFiles())
    for col in ("a", "b", "c"):
        pruned = read_table_pruned(spark, tbl, col, 0, 99)
        want = sorted(
            r.id for r in read_table(spark, tbl).where(F.col(col).between(0, 99)).collect()
        )
        assert sorted(r.id for r in pruned.collect()) == want
        assert len(pruned.inputFiles()) < total, col  # every key prunes
