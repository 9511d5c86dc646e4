"""The Arrow Gram kernel must equal the oracle-checked int-covariance
query BIT-IDENTICALLY (integer partials -> identical final doubles),
and its plan must stay one Python crossing + one constant-key-space
aggregate."""

from __future__ import annotations

from wnv_etl_lab2_spark.operators.linalg import gram_matrix_int
from wnv_etl_lab2_spark.sources.catalog import load_table


def test_arrow_gram_bit_identical_to_query(spark, sf_dir):
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    want = {
        (r.i, r.j): (r.n, r.cov_q)
        for r in REGISTRY["embedding_covariance_int8"].fn(spark, sf_dir).collect()
    }
    emb = load_table(spark, "embeddings", sf_dir)
    got = {
        (r.i, r.j): (r.n, r.cov_q) for r in gram_matrix_int(emb).collect()
    }
    assert got == want  # exact equality, not a tolerance
    assert len(got) == 64 * 65 // 2


def test_arrow_gram_plan_shape(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    plan = gram_matrix_int(emb)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
