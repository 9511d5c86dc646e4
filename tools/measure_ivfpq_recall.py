#!/usr/bin/env python
"""Measure mean recall@10 of the quantized ANN serve paths against
exact L2 — raw-vector PQ vs the IVFADC residual composition at the
IDENTICAL 8-codes-per-vector byte budget (round 12; the numbers in
SCALING.md §Similarity).

Why 20 query vectors: single-query recall on this corpus is seed
noise — pairwise distances of near-uniform unit vectors concentrate,
so one query's 1/10 vs 5/10 says nothing (the registry queries pin
vec_id=0 for oracle determinism, not for statistics). The mean over a
seeded 20-query sample is the statistically meaningful comparison.

Method: numpy replay of exactly the plan arithmetic — same centroid/
codebook constants, same argmin tie-breaks (stable sorts = lowest
index first), same ADC fold — checked against the Spark operators by
the oracle gate; numpy here only buys measurement speed.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wnv_etl_lab2_spark.queries._ivf_centroids import CENTROIDS
from wnv_etl_lab2_spark.queries._ivfpq_codebooks import RESIDUAL_CODEBOOKS
from wnv_etl_lab2_spark.queries._pq_codebooks import CODEBOOKS

N_QUERIES = 20
QUERY_SEED = 7
K = 10
SHORTLIST = 200


def encode(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, _, d = books.shape
    codes = np.empty((len(X), m), dtype=int)
    for s in range(m):
        sub = X[:, s * d : (s + 1) * d]
        dist = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = dist.argmin(1)
    return codes


def measure(sf_dir: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    X = np.array(t.column("embedding").to_pylist(), dtype=float)
    ids = np.array(t.column("vec_id").to_pylist())
    order = ids.argsort()
    X = X[order]
    C = np.array(CENTROIDS)
    B_raw = np.array(CODEBOOKS)
    B_res = np.array(RESIDUAL_CODEBOOKS)
    m, _, d = B_raw.shape
    n = len(X)

    cl = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    codes_raw = encode(X, B_raw)
    codes_res = encode(X - C[cl], B_res)

    rng = np.random.default_rng(QUERY_SEED)
    qidx = rng.choice(n, N_QUERIES, replace=False)
    out = {"raw_adc": [], "ivfpq_adc_np6": [], "ivfpq_adc_np16": [], "ivfpq_refined": []}
    for qi in qidx:
        q = X[qi]
        idxs = np.delete(np.arange(n), qi)
        d_true = ((X - q) ** 2).sum(-1)
        truth = set(idxs[np.argsort(d_true[idxs], kind="stable")[:K]])

        lut_raw = np.stack(
            [((q[s * d : (s + 1) * d][None, :] - B_raw[s]) ** 2).sum(-1) for s in range(m)]
        )
        adc_raw = lut_raw[np.arange(m)[None, :], codes_raw].sum(-1)
        out["raw_adc"].append(
            len(set(idxs[np.argsort(adc_raw[idxs], kind="stable")[:K]]) & truth)
        )

        qd = ((q[None, :] - C) ** 2).sum(-1)
        for nprobe, key in ((6, "ivfpq_adc_np6"), (16, "ivfpq_adc_np16")):
            probes = set(np.argsort(qd, kind="stable")[:nprobe])
            lut = {
                c: np.stack(
                    [
                        (((q - C[c])[s * d : (s + 1) * d][None, :] - B_res[s]) ** 2).sum(-1)
                        for s in range(m)
                    ]
                )
                for c in probes
            }
            cand = np.array([i for i in idxs if cl[i] in probes])
            adc = np.array([lut[cl[i]][np.arange(m), codes_res[i]].sum() for i in cand])
            rank = np.argsort(adc, kind="stable")
            out[key].append(len(set(cand[rank[:K]]) & truth))
            if nprobe == 6:
                short = cand[rank[:SHORTLIST]]
                dref = ((X[short] - q) ** 2).sum(-1)
                out["ivfpq_refined"].append(
                    len(set(short[np.argsort(dref, kind="stable")[:K]]) & truth)
                )
    return {k: float(np.mean(v)) for k, v in out.items()} | {"n_corpus": n}


def main() -> None:
    for sf in ("sf0.01", "sf0.1"):
        r = measure(f"/root/testdata/{sf}")
        print(
            f"{sf} (n={r['n_corpus']}, {N_QUERIES} queries): "
            f"raw-PQ ADC {r['raw_adc']:.2f} | "
            f"IVFPQ ADC np6 {r['ivfpq_adc_np6']:.2f} "
            f"np16 {r['ivfpq_adc_np16']:.2f} | "
            f"IVFPQ refined(6,{SHORTLIST}) {r['ivfpq_refined']:.2f}"
        )


if __name__ == "__main__":
    main()
