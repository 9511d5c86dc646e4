"""Distributed linear algebra kernels (round 9): the Arrow/numpy
production path of `queries/similarity_q.embedding_covariance_int8`.

The query's per-row upper-triangle expansion (2080 structs per vector
at d=64) is oracle-exact but pays Catalyst per-element overhead; at
corpus scale the right kernel is ONE integer matrix product per Arrow
batch — numpy's X^T X runs at BLAS throughput and produces the SAME
exact int64 partials, so the two paths are pinned bit-identical (not
tolerance-compared) in tests/test_linalg.py.

Shape: mapInPandas emits <= d(d+1)/2 partial rows per BATCH (never per
vector), the groupBy over the constant (i, j) key space merges
partials map-side, and the final covariance division reuses the
query's shared SQL fragment verbatim. Nothing corpus-sized shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def gram_matrix_int(
    df: DataFrame, vec_col: str = "embedding", scale: int = 1000
) -> DataFrame:
    """Exact-integer covariance of ``vec_col`` (fixed-grid quantized at
    ``scale``), bit-identical to `embedding_covariance_int8`: columns
    (i, j, n, cov_q) over the upper triangle i <= j."""
    from wnv_etl_lab2_spark.queries.similarity_q import _COV_FINAL

    def part(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ) * scale
            # SQL ROUND semantics (half away from zero), NOT numpy's
            # default half-even — the one place the kernels could split
            M = np.trunc(X + np.copysign(0.5, X)).astype(np.int64)
            d = M.shape[1]
            G = M.T @ M
            s = M.sum(axis=0)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu.astype(np.int64),
                    "j": ju.astype(np.int64),
                    "n": np.int64(len(M)),
                    "s1": s[iu],
                    "s2": s[ju],
                    "s12": G[iu, ju],
                }
            )

    partials = df.select(vec_col).mapInPandas(
        part, schema="i long, j long, n long, s1 long, s2 long, s12 long"
    )
    agg = partials.groupBy("i", "j").agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s12").alias("s12"),
    )
    return agg.select("i", "j", "n", F.expr(_COV_FINAL).alias("cov_q"))
