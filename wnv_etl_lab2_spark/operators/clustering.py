"""Distributed Lloyd k-means over an embedding column (round 9).

`operators/similarity.py` trains its IVF coarse quantizer on a
bounded driver-side SAMPLE (standard ANN practice); this module adds
the full distributed refinement a clustering consumer (SemDeDup
pruning, per-cluster curation quotas, corpus cartography) wants: the
sample only INITIALIZES the centroids, then every Lloyd iteration
runs over the WHOLE corpus —

- ASSIGN: nearest-centroid index as a pure map (`ivf_assign_col` —
  centroid literals baked into the plan, JVM higher-order functions,
  no shuffle, no Python);
- UPDATE: per-cluster per-dimension sums via posexplode +
  ONE combinable aggregation whose key space is k x d (map-side
  partials bound the shuffle at partitions x k x d rows regardless of
  corpus size), collected as the next k x d-float centroid table (a
  bounded driver artifact, same class as the init sample);
- INERTIA: the same aggregation pass carries the per-row squared
  distance, so convergence is observable without an extra job.

Determinism: init is a farthest-first traversal of the hash-ordered
sample (no randomness at all); every subsequent step is exact
arithmetic over a fixed assignment, so the trajectory is reproducible
run to run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from wnv_etl_lab2_spark.operators.similarity import (
    _centroid_sample,
    ivf_assign_col,
)


def _farthest_first(sample: list[list[float]], k: int) -> list[list[float]]:
    """Deterministic k-means++-style seeding: start from the sample's
    first point (the hash-ordered sample is already an unbiased draw)
    and greedily add the point farthest from its nearest chosen seed.
    Farthest-first traversal spreads seeds across all true clusters,
    which random seeding can miss (two seeds in one dense cluster is
    the classic Lloyd local optimum — the failure an LCG draw produced
    on planted clusters in this repo's own test)."""
    cents = [list(sample[0])]
    d2 = [sum((a - b) * (a - b) for a, b in zip(v, cents[0])) for v in sample]
    while len(cents) < k:
        far = max(range(len(sample)), key=lambda i: (d2[i], i))
        cents.append(list(sample[far]))
        for i, v in enumerate(sample):
            nd = sum((a - b) * (a - b) for a, b in zip(v, cents[-1]))
            if nd < d2[i]:
                d2[i] = nd
    return cents


@dataclass(frozen=True)
class KMeansModel:
    centroids: list[list[float]]
    inertia: list[float]  # per refinement iteration, non-increasing

    def assign(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Cluster id per row — pure map, fused into the scan."""
        return df.withColumn("cluster", ivf_assign_col(vec_col, self.centroids))


def _dist_col(vec_col: str, centroids: list[list[float]]):
    """Squared L2 to the NEAREST centroid (for inertia)."""
    dists = []
    for cent in centroids:
        p = F.array(*[F.lit(float(v)) for v in cent])
        dists.append(
            F.aggregate(
                F.zip_with(F.col(vec_col), p, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    return F.array_min(F.array(*dists))


def lloyd_refine(
    v: DataFrame,
    cents: list[list[float]],
    iters: int,
    vec_col: str = "_e",
) -> tuple[list[list[float]], list[float]]:
    """Full-corpus Lloyd refinement of ANY initial centroids (round-10
    factoring: `kmeans_fit` uses it after farthest-first seeding, and
    the IVF quantizer / SemDeDup paths in `operators/similarity.py`
    call it to upgrade their sample-trained centroids). ``v`` needs a
    double-array ``vec_col``. Returns (refined centroids, per-iteration
    inertia — non-increasing, measured under the iteration's INPUT
    centroids, so ``inertia[0]`` is the quality of the initialization).

    Scale shape per iteration (module docstring): ASSIGN is a pure
    map, UPDATE one combinable (cluster, dim) aggregation with k·d key
    space; the per-iteration collect is the bounded k·d stats table."""
    d = len(cents[0])
    inertia: list[float] = []
    for _ in range(iters):
        assigned = v.select(
            F.col(vec_col).alias("_e"),
            ivf_assign_col(vec_col, cents).alias("_c"),
            _dist_col(vec_col, cents).alias("_d2"),
        )
        # ONE combinable aggregation: (cluster, dim) sums + counts +
        # the inertia term riding along; key space k*d, map-side
        # partials bound the shuffle independent of corpus size
        stats = (
            assigned.select("_c", "_d2", F.posexplode("_e").alias("_dim", "_x"))
            .groupBy("_c", "_dim")
            .agg(
                F.sum("_x").alias("_sx"),
                F.count(F.lit(1)).alias("_n"),
                F.sum("_d2").alias("_sd2"),
            )
            .collect()
        )
        sums = {}
        counts = {}
        total_d2 = 0.0
        for r in stats:
            sums.setdefault(r._c, [0.0] * d)[r._dim] = r._sx
            counts[r._c] = r._n
            if r._dim == 0:
                total_d2 += r._sd2
        inertia.append(total_d2)
        new_cents = []
        for c in range(len(cents)):
            if counts.get(c):
                new_cents.append([s / counts[c] for s in sums[c]])
            else:  # empty cluster keeps its centroid (standard Lloyd)
                new_cents.append(cents[c])
        cents = new_cents
    return cents, inertia


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 8,
    iters: int = 5,
    sample_size: int = 512,
    id_col: str | None = None,
) -> KMeansModel:
    """Fit k-means: sample-initialized, corpus-refined. ``df`` needs
    ``vec_col`` (array<float/double>) and, for deterministic sampling,
    an ``id_col`` (defaults to the first column)."""
    id_col = id_col or df.columns[0]
    v = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_e"),
    )
    sample = _centroid_sample(v, "_id", sample_size)
    cents = _farthest_first(sample, n_clusters)
    cents, inertia = lloyd_refine(v, cents, iters)
    return KMeansModel(centroids=cents, inertia=inertia)
