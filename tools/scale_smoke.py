#!/usr/bin/env python
"""Scaling smoke: run the heavy dedup/similarity operators on 1x/4x/16x
in-memory replications of the sf0.1 corpus and report how wall-clock
grows vs input size. The claim under test is SCALING.md's: these plans
are linear-ish in input (bucketed pair joins, digest shuffles, pure-map
signatures) — a quadratic regression would show up as wall growing with
the SQUARE of the replication factor.

Replication preserves the workload's structure instead of synthesizing
new data: every replica keeps the corpus's near-dup clusters (ids are
remapped per replica, so pair counts scale linearly and LSH buckets get
k-fold deeper — the stress a growing corpus actually applies).

Writes SCALE_SMOKE.md. Not part of the per-round bench contract; run
ad hoc after plan-shaping changes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from wnv_etl_lab2_spark import get_spark
from wnv_etl_lab2_spark.operators.dedup import minhash_lsh_pairs, simhash_signatures
from wnv_etl_lab2_spark.operators.similarity import neardup_pairs_lsh_blocked
from wnv_etl_lab2_spark.operators.spatial import within_distance_anti_join
from wnv_etl_lab2_spark.queries import geo

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FACTORS = (1, 4, 16)


def replicate(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """k structure-preserving copies: ids remapped to id*k + replica so
    replicas never collide; everything else (text, embeddings, labels)
    repeats, which keeps near-dup clusters intact per replica."""
    if k == 1:
        return df
    rep = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep")
    return df.select("*", rep).withColumn(
        id_col, F.col(id_col) * k + F.col("_rep")
    ).drop("_rep")


def timed(label: str, make_df) -> float:
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        make_df().write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return min(runs)


# Re-emitted on every run so regeneration can't lose the context that
# makes the numbers meaningful.
_HISTORY = """
History — this smoke caught a real quadratic, then verified the fix:

- Before the exact-dedup-first stage, x16 `embedding_neardup_pairs`
  measured **177 s (58x)**: bit-identical replicas agree on every LSH
  band, so every bucket got 16x deep and the candidate stage exploded
  quadratic-times-bands. With identical vectors grouped by content
  digest and only representatives entering LSH
  (`operators/similarity.py`), x16 is ~3 s (~1x).
- `minhash_lsh_pairs` had the same latent hazard plus a worse one: a
  duplicate group deeper than ``max_bucket`` would have its buckets
  silently DROPPED (recall loss for exactly the boilerplate pages a
  crawl duplicates most). Same dedup-first treatment
  (`operators/dedup.py`): x16 went from 3.5x to ~1x (flat —
  candidate work is per unique text).
- `simhash_signatures` was the last superlinear curve (6.6x wall at
  16x in round 4): the 64-per-bit-SUM aggregate form paid rows x 64
  aggregate updates per TOKEN through a groupBy shuffle. Rebuilt as a
  pure map (JVM in-row token hashing + Arrow numpy bit-count kernel,
  `operators/dedup.py simhash_signatures`): x16 8.13 -> ~2 s and the
  shuffle is gone entirely.
- `spatial_distance_anti_join` (round 5): the old form ENUMERATED
  every in-cell candidate pair via inner join + distinct + join-back
  — under coordinate pileup (replicated points in the same cells)
  that is k^2 in-cell, measured 9x wall at 16x. Rewritten as a
  single anti/semi join with the exact distance predicate in the
  join CONDITION (true per-row short-circuit) plus distinct-first on
  avoid coordinates (duplicate avoid points cannot change a
  verdict): x16 went 2.7 s -> ~0.3 s, ~1x.
- `simhash_signatures` round 6: the remaining x16 growth was the
  token md5 computed TWICE per token (once per 32-bit half);
  projecting the digest array once and parsing both halves from it
  (CollapseProject keeps a twice-referenced non-cheap binding) cut
  the JVM hash stage 2.24 s -> 1.40 s at x16, and the spreading
  repartition is now skipped whenever the input is already parallel
  (at 100 TB there is no exchange at all). The residual x16/x1 ratio
  (~2.5-3.5x run-to-run) is an overhead artifact of the 0.4 s x1 —
  the per-unit column shows cost per doc FALLING ~5x as the input
  grows; there is no superlinear term left.
- The replication smoke is adversarial by construction (every doc has
  k exact copies — the crawl-corpus duplicate-pileup case).
"""


def main() -> None:
    spark = get_spark(app_name="scale-smoke", cpus=CPUS, shuffle_partitions=CPUS)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    # spatial family: the grid-bucketed distance anti-join under
    # coordinate pileup (replicated points land in the same cells —
    # the analogue of boilerplate-page duplicates for geometry)
    spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")).createOrReplaceTempView(
        "customer"
    )
    spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet")).createOrReplaceTempView(
        "supplier"
    )
    pts = spark.sql(geo.CUST_POINTS_CTE)
    avoid = spark.sql(geo.SUPP_POINTS_CTE)

    ops = {
        "exact_dedup_groupby": lambda d, e: d.select(
            F.md5("text").alias("h"), "doc_id"
        ).groupBy("h").agg(F.min("doc_id"), F.count(F.lit(1))),
        "minhash_lsh_pairs": lambda d, e: minhash_lsh_pairs(
            d, num_hashes=32, bands=16, threshold=0.5
        ),
        "simhash_signatures": lambda d, e: simhash_signatures(d),
        "embedding_neardup_pairs": lambda d, e: neardup_pairs_lsh_blocked(
            e, threshold=0.3
        ),
    }

    # Warm every operator once (x1 shape) so the k=1 measurements are
    # steady-state plan cost, not first-call codegen/class-loading —
    # an inflated x1 flatters every ratio.
    for make in ops.values():
        make(docs, emb).write.mode("overwrite").format("noop").save()
    within_distance_anti_join(pts, avoid, geo.RADIUS_DEG, "addr_id").write.mode(
        "overwrite"
    ).format("noop").save()

    results: dict[str, dict[int, float]] = {name: {} for name in ops}
    results["spatial_distance_anti_join"] = {}
    rows: dict[int, int] = {}
    for k in FACTORS:
        d = replicate(docs, "doc_id", k).localCheckpoint()  # materialize the
        e = replicate(emb, "vec_id", k).localCheckpoint()   # input ONCE per k
        rows[k] = d.count()
        for name, make in ops.items():
            results[name][k] = timed(name, lambda m=make, d=d, e=e: m(d, e))
            print(f"k={k} {name}: {results[name][k]:.2f}s", flush=True)
        p = replicate(pts, "addr_id", k).localCheckpoint()
        av = replicate(avoid, avoid.columns[0], k).localCheckpoint()
        results["spatial_distance_anti_join"][k] = timed(
            "spatial",
            lambda p=p, av=av: within_distance_anti_join(
                p, av, geo.RADIUS_DEG, "addr_id"
            ),
        )
        print(
            f"k={k} spatial_distance_anti_join: "
            f"{results['spatial_distance_anti_join'][k]:.2f}s",
            flush=True,
        )

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALE_SMOKE.md"), "w") as f:
        f.write(
            "# SCALE_SMOKE — wall vs in-memory corpus replication "
            f"(base {SF_DIR}, local[{CPUS}])\n\n"
            "Structure-preserving replication (ids remapped per replica); "
            "inputs localCheckpoint'ed so each measurement excludes "
            "replication cost. `xN/x1` columns show the wall growth for an "
            "N-fold input — linear plans stay near N (scheduling overhead "
            "makes small factors sub-linear); a quadratic pair explosion "
            "would show ~N^2. `per-unit x16` = x16/(16*x1): the change in\n"
            "cost PER INPUT UNIT — sub-second x1 rows are dominated by fixed\n"
            "scheduling overhead, so their xN/x1 ratios overstate growth;\n"
            "per-unit <= 1 means the operator got cheaper per doc as the\n"
            "input grew (amortized overhead), the signature of a linear\n"
            "plan.\n\n"
            "| operator | x1 (s) | x4 (s) | x16 (s) | x4/x1 | x16/x1 "
            "| per-unit x16 |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for name, by_k in results.items():
            f.write(
                f"| {name} | {by_k[1]:.2f} | {by_k[4]:.2f} | {by_k[16]:.2f} "
                f"| {by_k[4] / by_k[1]:.1f}x | {by_k[16] / by_k[1]:.1f}x "
                f"| {by_k[16] / (16 * by_k[1]):.2f}x |\n"
            )
        f.write(
            f"\nRows: x1 = {rows[1]:,} docs, x16 = {rows[16]:,} docs "
            f"(embeddings and points scale identically).\n"
        )
        f.write(_HISTORY)
    print("wrote SCALE_SMOKE.md", flush=True)


if __name__ == "__main__":
    main()
