"""Property tests for the round-2 text/vector additions — guarantees
the DuckDB oracle equality can't express."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_winnowing_shared_run_guarantee(spark):
    """Two documents sharing a >= k+w-1 = 11 char run MUST share a
    fingerprint (the winnowing guarantee); two random-ish disjoint
    strings should not."""
    from wnv_etl_lab2_spark.queries.text_q import winnow_fingerprints
    import tempfile, os

    docs = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="XXXXX quick brown fox jumps YYYYYQQ"),
        Row(doc_id=3, text="zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(docs).write.parquet(os.path.join(tmp, "documents.parquet"))
        fps = winnow_fingerprints(spark, tmp)
        by_doc = {
            r.doc_id: set(r.fps)
            for r in fps.groupBy("doc_id").agg(F.collect_set("fp").alias("fps")).collect()
        }
    assert by_doc[1] & by_doc[2], "shared 'quick brown fox jumps' run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert len(by_doc[3]) == 1, "constant text has one distinct gram hash"


def test_quantize_error_bound(spark, sf_dir):
    """Reconstruction error of absmax-int8 must be <= 0.5/scale
    (half a quantization step) and saturation only at |q| = 127."""
    from wnv_etl_lab2_spark.queries.similarity_q import embedding_quantize_int8

    rows = embedding_quantize_int8(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 5.1e-7 slack: max_abs_err is ROUNDed to 6 dp in the query
        assert r.max_abs_err <= 0.5 / r.scale + 5.1e-7
        assert r.n_saturated >= 1  # the absmax element itself hits +-127


def test_pareto_frontier_two_phase_equals_naive(spark):
    """The corpus frontier is near-degenerate (quality correlates with
    length), so exercise the two-phase skyline on adversarial
    anti-correlated points with a known frontier: y = -x staircase
    plus dominated interior points and exact duplicates (both copies
    of a frontier point must survive — neither strictly dominates)."""
    from wnv_etl_lab2_spark.queries.curation_q import _frontier_keep
    from pyspark.sql import functions as F

    rows = []
    # staircase frontier: (i, 100 - i) for i in 0..99
    rows += [(i, "en", i, float(100 - i)) for i in range(100)]
    # dominated interior: strictly inside the staircase
    rows += [(1000 + i, "en", i, float(50 - i)) for i in range(40)]
    # duplicate frontier point
    rows += [(2000, "en", 50, 50.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, x long, y double")
    s = df.withColumn("_shard", F.pmod("doc_id", F.lit(16)))
    local = (
        s.withColumn("_keep", _frontier_keep("x", "y", "lang", "_shard"))
        .where("_keep").drop("_keep", "_shard")
    )
    got = {
        (r.doc_id, r.x)
        for r in local.withColumn("_keep", _frontier_keep("x", "y", "lang"))
        .where("_keep").collect()
    }
    want = {(i, i) for i in range(100)} | {(2000, 50)}
    assert got == want, f"missing={sorted(want-got)[:5]} extra={sorted(got-want)[:5]}"


def test_fuzzy_prefix_pairs_hot_block_capped(spark, tmp_path):
    """The declared block cap (256) is the fuzzy join's quadratic
    guard, but no real SF has a block that hot (max 91 at sf0.1), so
    the cap path needs a synthetic corpus: 300 docs sharing one opener
    block must produce ZERO pairs (block dropped whole), while a
    2-doc near-identical block still matches — and the DuckDB oracle
    agrees on the same staged parquet."""
    from tests.oracle_harness import compare, run_oracle
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    hot = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta iota kappa v{i}", "en", "s0", 60)
        for i in range(300)
    ]
    cold = [
        (1000, "one two three four five six seven eight nine ten eleven", "en", "s1", 60),
        (1001, "one two three fuor fiive six seven eight nine ten eleven", "en", "s1", 60),
    ]
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = pd.DataFrame(
        hot + cold, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf_dir = str(tmp_path)
    # single parquet FILE, same layout as /root/testdata (both engines
    # read the identical staged corpus)
    pq.write_table(pa.Table.from_pandas(rows), f"{sf_dir}/documents.parquet")
    spec = REGISTRY["fuzzy_prefix_pairs"]
    pdf = spec.fn(spark, sf_dir).toPandas()
    assert set(pdf.doc_a) == {1000}, "hot block leaked pairs past the cap"
    assert set(pdf.doc_b) == {1001}
    compare(pdf, run_oracle(spec.oracle, sf_dir), "fuzzy_prefix_pairs_capped")
