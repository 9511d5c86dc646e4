"""Measure what `refine_iters` buys the PERSISTED IVF index that
`ann_topk_ivf` serves against (r10 verdict #6): build the index twice
at the same seed — sample-only quantizer (refine_iters=0) vs 3
full-corpus Lloyd refinement iterations — and report, for each:

- recall@10 vs exact brute-force cosine, averaged over a panel of
  held-out query vectors (the first N corpus vectors, each excluded
  from its own candidate set on both arms);
- bucket-depth balance: per-cluster row counts' max/mean and
  population stddev/mean (CV) — flatter cells bound the worst-case
  probe cost, which is what a probe-limited serve path pays for.

Run:  python tools/measure_ivf_refinement.py [sf_dir]   (default sf0.1)
Prints one JSON line; the current numbers are recorded in
SCALING.md §Clustering.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_CLUSTERS = 16
SAMPLE_SIZE = 512
SEED = 42
NPROBE = 4
K = 10
N_QUERIES = 20


def main() -> None:
    from pyspark.sql import functions as F

    from wnv_etl_lab2_spark import get_spark
    from wnv_etl_lab2_spark.operators.similarity import (
        as_double_array,
        brute_force_topk,
        ivf_index_build,
        ivf_index_query,
    )

    spark = get_spark(app_name="ivf-refinement-measure")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    panel = {
        int(r["vec_id"]): [float(x) for x in r["_e"]]
        for r in emb.select("vec_id", as_double_array("embedding").alias("_e"))
        .orderBy("vec_id")
        .limit(N_QUERIES)
        .collect()
    }
    # exact ground truth per query (query vector excluded from candidates)
    truth = {
        qid: {
            r["vec_id"]
            for r in brute_force_topk(
                emb.where(F.col("vec_id") != qid), qvec, k=K
            ).collect()
        }
        for qid, qvec in panel.items()
    }

    out: dict = {"sf_dir": SF_DIR, "k": K, "nprobe": NPROBE, "seed": SEED}
    for label, iters in (("sample_only", 0), ("refined_3", 3)):
        with tempfile.TemporaryDirectory() as d:
            ivf_index_build(
                emb, d, n_clusters=N_CLUSTERS, sample_size=SAMPLE_SIZE,
                seed=SEED, refine_iters=iters,
            )
            depths = [
                int(r["n"])
                for r in spark.read.parquet(os.path.join(d, "vectors"))
                .groupBy("_cl").agg(F.count(F.lit(1)).alias("n")).collect()
            ]
            hits = 0
            for qid, qvec in panel.items():
                got = {
                    r["vec_id"]
                    for r in ivf_index_query(spark, d, qvec, k=K, nprobe=NPROBE)
                    .where(F.col("vec_id") != qid)
                    .limit(K)
                    .collect()
                }
                hits += len(got & truth[qid])
            mean = statistics.mean(depths)
            out[label] = {
                "recall_at_10": round(hits / (K * len(panel)), 4),
                "n_cells": len(depths),
                "depth_max_over_mean": round(max(depths) / mean, 3),
                "depth_cv": round(statistics.pstdev(depths) / mean, 3),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
