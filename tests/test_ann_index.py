"""Persisted IVF index (operators/similarity.ivf_index_build/query):
build-once/query-many must equal the inline IVF math, and probing must
physically read only the probed cluster partitions."""

from __future__ import annotations

from wnv_etl_lab2_spark.operators.similarity import (
    ivf_ann_topk,
    ivf_index_build,
    ivf_index_query,
)
from wnv_etl_lab2_spark.sources.catalog import load_table


def test_persisted_ivf_equals_inline_and_prunes(spark, sf_dir, tmp_path):
    emb = load_table(spark, "embeddings", sf_dir)
    qvec = [float(v) for v in emb.where("vec_id = 0").select("embedding").head()[0]]
    corpus = emb.where("vec_id <> 0")

    idx = str(tmp_path / "ivf_index")
    ivf_index_build(corpus, idx, n_clusters=16, sample_size=512, seed=42)

    got = ivf_index_query(spark, idx, qvec, k=10, nprobe=4).collect()
    want = ivf_ann_topk(corpus, qvec, k=10, n_clusters=16, nprobe=4).collect()
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (r.vec_id, r.cos_sim) for r in want
    ]

    # partition pruning: the probe predicate must reach the scan as a
    # PARTITION filter (the layout's _cl= directories are skipped at
    # file-listing time, not post-scan) — inputFiles() reports the
    # unpruned relation, so assert on the physical plan instead
    plan = (
        ivf_index_query(spark, idx, qvec, k=10, nprobe=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "_cl" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0], plan
    # and the index layout really is hive-partitioned by cluster
    assert any(
        "/_cl=" in f for f in spark.read.parquet(idx + "/vectors").inputFiles()
    )


def test_persisted_ivf_empty_corpus_raises(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        ivf_index_build(df, str(tmp_path / "empty_idx"))


def test_refined_quantizer_improves_inertia_and_contracts_hold(spark, sf_dir, tmp_path):
    """Round-10: `refine_iters` upgrades the sample-trained IVF
    quantizer with full-corpus Lloyd refinement. Pins (a) the refined
    centroids' corpus inertia is <= the sample-only centroids' (Lloyd
    monotonicity from any start), (b) the persisted-index / inline
    equality contract holds unchanged WITH refinement, (c) top-k
    recall vs exact brute force does not degrade."""
    from pyspark.sql import functions as F

    from wnv_etl_lab2_spark.operators.clustering import _dist_col
    from wnv_etl_lab2_spark.operators.similarity import (
        _trained_centroids,
        as_double_array,
        brute_force_topk,
        ivf_ann_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    corpus = emb.where(F.col("vec_id") != 0)
    v = corpus.select("vec_id", as_double_array("embedding").alias("_e"))

    def inertia(cents):
        return v.select(_dist_col("_e", cents).alias("d2")).agg(
            F.sum("d2")
        ).head()[0]

    plain = _trained_centroids(v, "vec_id", 16, 512, 42, refine_iters=0)
    refined = _trained_centroids(v, "vec_id", 16, 512, 42, refine_iters=3)
    assert inertia(refined) <= inertia(plain)

    exact = [r.vec_id for r in brute_force_topk(corpus, qvec, k=10).collect()]
    got_plain = [
        r.vec_id for r in ivf_ann_topk(corpus, qvec, k=10, nprobe=5).collect()
    ]
    got_ref = [
        r.vec_id
        for r in ivf_ann_topk(corpus, qvec, k=10, nprobe=5, refine_iters=3).collect()
    ]
    assert len(set(got_ref) & set(exact)) >= len(set(got_plain) & set(exact))

    # persisted index with refinement == inline with refinement
    from wnv_etl_lab2_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_query,
    )

    idx = str(tmp_path / "ivf_refined")
    ivf_index_build(corpus, idx, refine_iters=3)
    persisted = [
        (r.vec_id, r.cos_sim)
        for r in ivf_index_query(spark, idx, qvec, k=10, nprobe=5).collect()
    ]
    inline = [
        (r.vec_id, r.cos_sim)
        for r in ivf_ann_topk(
            corpus, qvec, k=10, nprobe=5, refine_iters=3
        ).collect()
    ]
    assert persisted == inline


def test_pq_encode_deterministic_and_refined_recall(spark, sf_dir):
    """Product quantization (round 11): encoding is deterministic
    (same codes every run, ties to the lowest code), pure-ADC top-k is
    a strict subset-quality tradeoff, and the refined serve path
    (ADC shortlist 200 -> exact re-rank) recovers >= 7/10 of the exact
    L2 top-10 on the fixture corpus — the measured trade SCALING.md
    records."""
    from pyspark.sql import functions as F

    from wnv_etl_lab2_spark.operators.similarity import (
        as_double_array,
        pq_encode_col,
        pq_topk_pretrained,
        pq_topk_refined,
    )
    from wnv_etl_lab2_spark.queries._pq_codebooks import CODEBOOKS, K_CODES, M_SUBSPACES

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    rest = emb.where(F.col("vec_id") != 0)

    codes = rest.select(
        "vec_id", pq_encode_col(as_double_array("embedding"), CODEBOOKS).alias("c")
    )
    got1 = {r.vec_id: list(r.c) for r in codes.collect()}
    got2 = {r.vec_id: list(r.c) for r in codes.collect()}
    assert got1 == got2  # deterministic
    assert all(len(c) == M_SUBSPACES for c in got1.values())
    assert all(0 <= x < K_CODES for c in got1.values() for x in c)

    # exact L2 ground truth
    qa = F.array(*[F.lit(x) for x in q])
    l2 = rest.select(
        "vec_id",
        F.aggregate(
            F.zip_with(as_double_array("embedding"), qa, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("d"),
    )
    truth = {
        r.vec_id
        for r in l2.orderBy(F.col("d").asc(), F.col("vec_id").asc()).limit(10).collect()
    }
    adc = {r.vec_id for r in pq_topk_pretrained(rest, q, CODEBOOKS).collect()}
    refined = {
        r.vec_id for r in pq_topk_refined(rest, q, CODEBOOKS, shortlist=200).collect()
    }
    assert len(refined & truth) >= 7  # the refined path recovers recall
    assert len(refined & truth) >= len(adc & truth)


def test_persisted_ivfpq_equals_inline_and_prunes(spark, sf_dir, tmp_path):
    """Round 12: the persisted IVFADC index (codes + vectors in one
    cell-partitioned table) must equal the inline refined serve path
    result-for-result, probe only the nprobe cells (partition filter
    in the plan), and read ONLY the code column during the shortlist
    scan (column pruning — embeddings stay on disk until refine)."""
    from wnv_etl_lab2_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_query,
        ivfpq_topk_refined,
    )
    from wnv_etl_lab2_spark.queries._ivf_centroids import CENTROIDS
    from wnv_etl_lab2_spark.queries._ivfpq_codebooks import RESIDUAL_CODEBOOKS

    emb = load_table(spark, "embeddings", sf_dir)
    qvec = [float(v) for v in emb.where("vec_id = 0").select("embedding").head()[0]]
    corpus = emb.where("vec_id <> 0")

    idx = str(tmp_path / "ivfpq_index")
    ivfpq_index_build(corpus, idx, CENTROIDS, RESIDUAL_CODEBOOKS)

    got = ivfpq_index_query(
        spark, idx, qvec, CENTROIDS, RESIDUAL_CODEBOOKS,
        k=10, nprobe=6, shortlist=50,
    )
    want = ivfpq_topk_refined(
        corpus, qvec, CENTROIDS, RESIDUAL_CODEBOOKS,
        k=10, nprobe=6, shortlist=50,
    ).collect()
    assert [(r.vec_id, r.l2_dist) for r in got.collect()] == [
        (r.vec_id, r.l2_dist) for r in want
    ]

    plan = got._jdf.queryExecution().executedPlan().toString()
    # partition pruning on the cell directory column: the CODE scan
    # carries the probe IN-list as a partition filter (the refine scan
    # legitimately shows an empty filter — it fetches by id)
    pf_segments = [
        seg.split("]")[0] for seg in plan.split("PartitionFilters: [")[1:]
    ]
    assert any("_cl" in seg and " IN " in seg for seg in pf_segments), pf_segments
    # column pruning: the shortlist scan's ReadSchema carries the codes
    # but NOT the embedding column (the refine scan reads _e separately)
    scans = [seg.split("]")[0] for seg in plan.split("ReadSchema: struct<")[1:]]
    code_scans = [seg for seg in scans if "_codes" in seg]
    assert code_scans and all("_e" not in seg for seg in code_scans)


def test_ivfpq_index_append_equals_rebuild_and_is_incremental(
    spark, sf_dir, tmp_path
):
    """Round 13 (r12 verdict #4): incremental IVFADC maintenance —
    appending a batch (a) yields IDENTICAL query results to a full
    rebuild over the same corpus (assignment/encode are deterministic
    per-row functions of the fixed constants), (b) touches ZERO
    existing index files and writes only O(batch) new ones, and (c)
    the source-version stamp makes a stale serve refuse after source
    DML the maintainer has not applied."""
    import os

    from wnv_etl_lab2_spark.operators.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_meta,
        ivfpq_index_query,
    )
    from wnv_etl_lab2_spark.queries._ivf_centroids import CENTROIDS
    from wnv_etl_lab2_spark.queries._ivfpq_codebooks import RESIDUAL_CODEBOOKS

    emb = load_table(spark, "embeddings", sf_dir)
    qvec = [float(v) for v in emb.where("vec_id = 0").select("embedding").head()[0]]
    corpus = emb.where("vec_id <> 0")
    old = corpus.where("vec_id % 10 <> 3")
    batch = corpus.where("vec_id % 10 = 3")

    def walk(d):
        out = {}
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getsize(p)
        return out

    inc = str(tmp_path / "inc")
    ivfpq_index_build(old, inc, CENTROIDS, RESIDUAL_CODEBOOKS, source_version=0)
    before = walk(inc)
    ivfpq_index_append(
        batch, inc, CENTROIDS, RESIDUAL_CODEBOOKS, source_version=1
    )
    after = walk(inc)
    # (b) O(batch): every pre-existing file byte-identical, only new
    # files added — never a rebuild
    assert all(after.get(p) == sz for p, sz in before.items())
    assert len(after) > len(before)
    assert ivfpq_index_meta(inc)["source_version"] == 1

    # (a) append == rebuild, query-for-query
    full = str(tmp_path / "full")
    ivfpq_index_build(corpus, full, CENTROIDS, RESIDUAL_CODEBOOKS, source_version=1)
    got_inc = ivfpq_index_query(
        spark, inc, qvec, CENTROIDS, RESIDUAL_CODEBOOKS,
        k=10, nprobe=6, shortlist=50, expect_source_version=1,
    ).collect()
    got_full = ivfpq_index_query(
        spark, full, qvec, CENTROIDS, RESIDUAL_CODEBOOKS,
        k=10, nprobe=6, shortlist=50,
    ).collect()
    assert [(r.vec_id, r.l2_dist) for r in got_inc] == [
        (r.vec_id, r.l2_dist) for r in got_full
    ]

    # (c) staleness: source moved to version 2, index still stamps 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stale"):
        ivfpq_index_query(
            spark, inc, qvec, CENTROIDS, RESIDUAL_CODEBOOKS,
            k=10, nprobe=6, shortlist=50, expect_source_version=2,
        )


def test_probe_vector_reads_one_row_group(spark, sf_dir, tmp_path, monkeypatch):
    """`_probe_vector` must prune row groups on the footer's vec_id
    min/max (r17 verdict #6): on a multi-row-group embeddings file it
    decodes exactly ONE row group for vec_id=0 — never the whole file
    onto the driver — and the value matches the Spark filter+head
    path byte-for-byte."""
    import pyarrow.parquet as pq

    from wnv_etl_lab2_spark.queries import similarity_q as SQ
    from wnv_etl_lab2_spark.sources.catalog import load_table

    d = str(tmp_path / "probe_sf")
    import os

    os.makedirs(d)
    emb = load_table(spark, "embeddings", sf_dir)
    # 8 row groups, vec_id-sorted so min/max stats are disjoint
    tbl = emb.orderBy("vec_id").toArrow()
    pq.write_table(
        tbl, os.path.join(d, "embeddings.parquet"),
        row_group_size=max(1, tbl.num_rows // 8),
    )
    assert pq.ParquetFile(os.path.join(d, "embeddings.parquet")).metadata.num_row_groups >= 2

    calls = []
    orig = pq.ParquetFile.read_row_group

    def counting(self, rg, *a, **kw):
        calls.append(rg)
        return orig(self, rg, *a, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", counting)
    got = SQ._probe_vector(emb, d, vec_id=0)
    assert len(calls) == 1  # exactly one row group decoded
    expect = SQ._probe_vector(emb, "/nonexistent_dir", vec_id=0)  # Spark path
    assert got == expect

    # byte-cap fallback: with a zero budget the Spark path is taken
    monkeypatch.setattr(SQ, "_PROBE_MAX_BYTES", 0)
    calls.clear()
    assert SQ._probe_vector(emb, d, vec_id=0) == expect
    assert calls == []  # no driver-side row-group decode
