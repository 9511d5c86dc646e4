"""Similarity search over embedding columns (BASELINE.json north star).

Two paths with the same output contract (query -> top-k neighbors):

- brute_force_topk: exact cosine against every row. The baseline; at
  100 TB it's still a single scan + TakeOrdered (no shuffle of the
  vectors), fine for one-off queries but linear per query.
- lsh_ann_topk: random-hyperplane LSH — deterministic seeded planes,
  sign-bit bucket id, candidates = same-bucket rows (multi-probe via
  several independent tables), exact cosine re-rank of candidates
  only. The scale path: the bucket id is an equi-join/groupBy key.

Vector math happens in JVM higher-order functions after casting the
float32 arrays to double, so Spark-side results are bit-stable and
comparable against the DuckDB oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _const_array(values) -> "F.Column":
    """A constant array<double> column built as ONE SQL expression
    string instead of len(values) `F.lit` py4j round trips (round 12:
    the constant-heavy quantizer plans — 16x64 centroids, 8x16x8
    codebooks, 8x16x16 ADC tables — spent ~85% of their wall in
    DRIVER-SIDE plan construction, ~1 ms per py4j call; one parsed
    string is ~10x cheaper). `repr(float)`+"D" round-trips doubles
    bit-exactly (pinned by every oracle gate that replays the same
    constants)."""
    return F.expr("array(" + ", ".join(f"{float(v)!r}D" for v in values) + ")")


def _const_array2(rows) -> "F.Column":
    """A constant array<array<double>> as one SQL expression string."""
    return F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{float(v)!r}D" for v in row) + ")"
            for row in rows
        )
        + ")"
    )


def as_double_array(col) -> "F.Column":
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine_to_query(vec_col, query_vec: list[float]) -> "F.Column":
    """Cosine similarity of an array<double> column against a constant
    query vector (folded into the plan as a literal array)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    dot = F.aggregate(
        F.zip_with(vec_col if not isinstance(vec_col, str) else F.col(vec_col), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nv = F.sqrt(F.aggregate(vec_col if not isinstance(vec_col, str) else F.col(vec_col), F.lit(0.0), lambda a, v: a + v * v))
    nq = math.sqrt(sum(v * v for v in query_vec))
    return dot / (nv * F.lit(nq))


def check_dim(vectors: DataFrame, vec_col: str, dim: int) -> None:
    """Fail fast on an embedding-width mismatch: ``F.zip_with`` against
    plane literals null-pads a short array (dot -> NULL, sign bit
    silently 0) while driver-side Python ``zip`` truncates — a wrong
    ``dim`` would produce garbage buckets and near-zero recall instead
    of an error. One-row probe, negligible cost next to any LSH job."""
    row = vectors.select(F.size(F.col(vec_col)).alias("n")).head(1)
    if row and row[0]["n"] != dim:
        raise ValueError(
            f"{vec_col!r} has {row[0]['n']} elements but dim={dim} was declared"
        )


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine. TakeOrdered plan: per-partition heap,
    driver merges k rows — no global sort, no vector shuffle.

    Zero-norm vectors are excluded: their cosine is 0/0 = NaN, which
    Spark sorts ABOVE every real similarity in a descending top-k."""
    v = vectors.select(id_col, as_double_array(vec_col).alias("_e"))
    nv = F.sqrt(F.aggregate(F.col("_e"), F.lit(0.0), lambda a, x: a + x * x))
    sim = v.where(nv > 0).select(
        id_col, F.round(cosine_to_query(F.col("_e"), query_vec), 6).alias("cos_sim")
    )
    return sim.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes via a tiny
    LCG (no numpy dependency in the plan; constants are baked into the
    expression tree)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append((state / 0x40000000) - 1.0)  # uniform-ish in [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket_col(vec_col, dim: int, n_planes: int = 12, seed: int = 42) -> "F.Column":
    """Sign-bit bucket id: bit i = (v . plane_i) > 0. Returns an int
    bucket in [0, 2^n_planes)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(F.zip_with(c, p, lambda a, b: a * b), F.lit(0.0), lambda a, v: a + v)
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: filter to rows sharing the query's LSH bucket
    (plus all buckets at hamming distance 1 — multi-probe), exact
    cosine re-rank of the candidates.

    At 100 TB: bucket ids are precomputed/partitioned at ingest, a
    query touches ~ (n_planes+1)/2^n_planes of the data. Here the
    bucket filter is an IN-list pushed to the scan.
    """
    if len(query_vec) != dim:
        raise ValueError(f"query_vec has {len(query_vec)} elements, dim={dim}")
    check_dim(vectors, vec_col, dim)
    v = vectors.select(id_col, as_double_array(vec_col).alias("_e"))
    v = v.withColumn("_bucket", lsh_bucket_col(F.col("_e"), dim, n_planes, seed))

    # driver-side bucket of the query vector (same plane constants)
    planes = _hyperplanes(dim, n_planes, seed)
    qb = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            qb |= 1 << i
    probes = [qb] + [qb ^ (1 << i) for i in range(n_planes)]

    nv = F.sqrt(F.aggregate(F.col("_e"), F.lit(0.0), lambda a, x: a + x * x))
    cand = v.where(F.col("_bucket").isin(probes) & (nv > 0))
    sim = cand.select(id_col, F.round(cosine_to_query(F.col("_e"), query_vec), 6).alias("cos_sim"))
    return sim.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def _kmeans_centroids(
    sample: list[list[float]], n_clusters: int, iters: int = 5, seed: int = 42
) -> list[list[float]]:
    """Tiny deterministic Lloyd k-means on a BOUNDED driver-side
    sample (standard IVF practice: train the coarse quantizer on a
    sample, assign/search fully distributed). Pure python+LCG — no
    randomness outside the seed."""
    state = seed & 0x7FFFFFFF
    idx = []
    n = len(sample)
    for _ in range(n_clusters):
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        idx.append(state % n)
    cents = [list(sample[i]) for i in idx]
    for _ in range(iters):
        sums = [[0.0] * len(cents[0]) for _ in cents]
        counts = [0] * len(cents)
        for v in sample:
            best, bd = 0, float("inf")
            for ci, c in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(v, c))
                if d < bd:
                    best, bd = ci, d
            counts[best] += 1
            s = sums[best]
            for j, a in enumerate(v):
                s[j] += a
        for ci in range(len(cents)):
            if counts[ci]:
                cents[ci] = [s / counts[ci] for s in sums[ci]]
    return cents


def _centroid_sample(v: DataFrame, id_col: str, sample_size: int) -> list[list[float]]:
    """Bounded driver-side training sample for the coarse quantizer,
    taken in HASH order of the id (``xxhash64`` — deterministic across
    runs, id tiebreak for hash collisions). Plain ``orderBy(id)`` would
    train on the lowest-id rows, which on a real corpus — where id
    correlates with source or ingest time — skews the quantizer toward
    the oldest/first source (round-7 verdict #6); hash order is an
    unbiased pseudo-random draw with the same determinism."""
    return [
        [float(x) for x in r["_e"]]
        for r in v.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample_size)
        .collect()
    ]


def _trained_centroids(
    v: DataFrame,
    id_col: str,
    n_clusters: int,
    sample_size: int,
    seed: int,
    refine_iters: int = 0,
    vec_col: str = "_e",
) -> list[list[float]] | None:
    """The shared quantizer-training path: bounded hash-ordered sample
    -> driver-side Lloyd (`_kmeans_centroids`), then — when
    ``refine_iters`` > 0 — FULL-CORPUS Lloyd refinement via
    `operators/clustering.lloyd_refine` (round-10: the clustering
    operator proved corpus refinement strictly beats sample-only
    training in its own tests, so the IVF quantizer and SemDeDup
    accept refined centroids too; each refinement iteration costs one
    combinable k·d aggregation over the corpus). ``None`` for an
    empty/fully-filtered input."""
    sample = _centroid_sample(v, id_col, sample_size)
    if not sample:
        return None
    cents = _kmeans_centroids(sample, n_clusters, seed=seed)
    if refine_iters > 0:
        from wnv_etl_lab2_spark.operators.clustering import lloyd_refine

        cents, _ = lloyd_refine(v, cents, refine_iters, vec_col=vec_col)
    return cents


def ivf_assign_col(vec_col, centroids: list[list[float]]) -> "F.Column":
    """Coarse-quantizer assignment: index of the nearest centroid
    (squared L2), computed with JVM higher-order functions against the
    centroid literals baked into the plan."""
    if isinstance(vec_col, str):
        # FULL-STRING fast path (round 12): the n_clusters x dim
        # constant plan is built as one parsed SQL expression instead
        # of hundreds of py4j Column/lambda round trips — identical
        # semantics (the oracle gates replay it), ~10x cheaper to
        # construct on the driver.
        def d2(cent) -> str:
            arr = "array(" + ", ".join(f"{float(v)!r}D" for v in cent) + ")"
            return (
                f"aggregate(zip_with({vec_col}, {arr}, (a, b) -> (a - b) * (a - b)), "
                "0.0D, (acc, v) -> acc + v)"
            )

        darr = "array(" + ", ".join(d2(c) for c in centroids) + ")"
        return F.expr(
            f"CAST(array_position({darr}, array_min({darr})) - 1 AS INT)"
        )
    c = vec_col
    dists = []
    for cent in centroids:
        p = _const_array(cent)
        d = F.aggregate(
            F.zip_with(c, p, lambda a, b: (a - b) * (a - b)), F.lit(0.0), lambda acc, v: acc + v
        )
        dists.append(d)
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def ivf_ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 512,
    seed: int = 42,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: train centroids on a bounded sample,
    assign every row to its nearest centroid (pure map — at ingest
    time in production), probe the ``nprobe`` centroids nearest the
    query, exact cosine re-rank of candidates only.
    ``refine_iters`` > 0 upgrades the quantizer with full-corpus Lloyd
    refinement before assignment (see `_trained_centroids`).

    Scan fraction ~ nprobe/n_clusters of the corpus; unlike the
    data-oblivious hyperplane LSH, the quantizer adapts to the data
    distribution, so recall holds up even without planted near-dups.
    """
    v = vectors.select(id_col, as_double_array(vec_col).alias("_e"))
    cents = _trained_centroids(v, id_col, n_clusters, sample_size, seed, refine_iters)
    if cents is None:
        # empty/fully-filtered input: an empty top-k, not a
        # ZeroDivisionError inside the centroid sampler
        return v.select(id_col, F.lit(0.0).alias("cos_sim")).where(F.lit(False))
    return ivf_topk_pretrained(vectors, query_vec, cents, k=k, nprobe=nprobe,
                               id_col=id_col, vec_col=vec_col)


def ivf_topk_pretrained(
    vectors: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF SERVE path against an already-trained quantizer
    (round-10 factoring): assignment is a pure map over the centroid
    literals, centroid ranking for the probe set is driver-side over
    the bounded artifact, and only the probed cells are cosine
    re-ranked. This is the query-many half of build-once/query-many —
    `ivf_ann_topk` composes it with inline training, `ann_topk_ivf`
    (queries/similarity_q.py) serves the checked-in pre-trained
    quantizer so a DuckDB oracle can replay it exactly."""
    v = vectors.select(id_col, as_double_array(vec_col).alias("_e"))
    assigned = v.withColumn("_cl", ivf_assign_col("_e", centroids))

    qd = [sum((a - b) * (a - b) for a, b in zip(query_vec, c)) for c in centroids]
    probes = [ci for ci, _ in sorted(enumerate(qd), key=lambda t: t[1])[:nprobe]]

    nv = F.sqrt(F.aggregate(F.col("_e"), F.lit(0.0), lambda a, x: a + x * x))
    cand = assigned.where(F.col("_cl").isin(probes) & (nv > 0))
    sim = cand.select(id_col, F.round(cosine_to_query(F.col("_e"), query_vec), 6).alias("cos_sim"))
    return sim.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def neardup_pairs_blocked(
    vectors: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key (here the
    label column; in a real pipeline the block is an LSH bucket id).
    The pair join is an equi-join on the block key — the cross product
    exists only inside a block, which is the scalable contract."""
    v = vectors.select(
        F.col(id_col), F.col(block_col).alias("_blk"), as_double_array(vec_col).alias("_e")
    )
    nrm = F.sqrt(F.aggregate(F.col("_e"), F.lit(0.0), lambda a, x: a + x * x))
    v = v.withColumn("_n", nrm)
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("_blk"), F.col("_e").alias("ea"), F.col("_n").alias("na")
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("_blk"), F.col("_e").alias("eb"), F.col("_n").alias("nb")
    )
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t)
    pairs = (
        a.join(b, ["_blk"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .where(F.col("cos_sim") >= threshold)
    )
    return pairs.select("id_a", "id_b", F.col("_blk").alias(block_col), "cos_sim")


def lsh_band_buckets_udf(dim: int, bands: int, rows_per_band: int, seed: int = 42):
    """Arrow-vectorized banded LSH signatures: a pandas UDF mapping the
    raw ``array<float>`` column to ``array<int>`` of ``bands`` bucket
    ids (bit i of band b = sign of the dot against plane
    ``b*rows_per_band + i``), computed as ONE NumPy matmul per Arrow
    batch — batch_rows x dim  @  dim x (bands*rows).

    Why a UDF when the repo's policy is built-ins-first: the pure
    Catalyst formulation was measured three ways at sf0.1 and every
    variant lost —
    - bands*rows separate aggregate-fold projections: higher-order
      functions never enter whole-stage codegen, so 48 interpreted
      folds per row dominated the whole pair job (~4.6 s of a 4.6 s
      query); unrolled `v[0]*c0 + ...` sums were worse still (janino
      64 KB method limit disables codegen outright).
    - one 2D plane literal + `transform` producing all dots: fast
      alone, but CollapseProject inlines the computed array into the
      downstream posexplode/groupBy and re-evaluates the 48 dots per
      EXPLODED row (measured 27 s — 6x worse than the baseline).
    The Arrow batch transfer moves bands from per-row interpreted
    folds to one BLAS matmul, and the UDF is an optimization barrier,
    so the signature is computed exactly once per row. Still a pure
    map over the scan — no shuffle, embarrassingly parallel at any
    scale. Plane coords are quantized to 2 decimals (a random
    direction stays random) so signatures are reproducible across
    rounds and engines.

    Bucket ids match the retired SQL formulation bit-for-bit except in
    the measure-zero case of a dot product within float rounding of
    0.0 (NumPy sums in a different order than a sequential fold);
    bucketing only gates CANDIDATES — the verify stage is exact — so
    this cannot change results, only (immeasurably) recall.
    """
    from pyspark.sql.types import ArrayType, IntegerType

    planes = np.array(_hyperplanes(dim, bands * rows_per_band, seed)).round(2).T
    bit_weights = (1 << np.arange(rows_per_band)).astype(np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(v.to_numpy()).astype(np.float64)
        signs = (m @ planes) > 0.0
        ids = signs.reshape(len(v), bands, rows_per_band) @ bit_weights
        return pd.Series(list(ids.astype(np.int32)))

    return buckets


def _direct_block_pairs(small: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Exact all-pairs cosine scoring of SMALL blocks as one Arrow
    grouped-map kernel (`applyInPandas` over the block key).

    Bit-exactness contract: the dot product is accumulated
    DIMENSION-sequentially (`acc += E[i,d] * E[j,d]` for d = 0..dim-1),
    vectorized across pairs — each pair's additions happen in exactly
    the order of the JVM `zip_with`/`aggregate` fold and DuckDB's
    `list_sum`, so the unrounded double is bit-identical to what those
    engines compute (numpy's pairwise-summed `dot`/`matmul` would NOT
    be). Norms are passed through from the shared frame, not
    recomputed. The kernel only PRE-filters with a slack margin and
    returns the raw quotient; the caller applies the engine's own
    `F.round` + threshold so the emitted cos_sim is the JVM's.

    Memory per group is bounded by the route's block-size cutoff
    (pairs <= direct_block_max^2 / 2), which is what makes this safe
    at any corpus scale."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id_a", small.schema[id_col].dataType),
            StructField("id_b", small.schema[id_col].dataType),
            StructField("_lbl", small.schema["_lbl"].dataType),
            StructField("_raw", DoubleType()),
        ]
    )
    # round6(x) >= t  <=>  x >= t - 5e-7; widen by a few ulps so the
    # JVM-side exact filter below is the only decision point
    margin = threshold - 5.0e-7 - 1.0e-9

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        k = len(ids)
        if k < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "_lbl", "_raw"])
        E = np.vstack(pdf["_e"].to_numpy()).astype(np.float64)
        n = pdf["_n"].to_numpy().astype(np.float64)
        i, j = np.triu_indices(k, 1)
        acc = np.zeros(len(i), dtype=np.float64)
        for d in range(E.shape[1]):
            acc += E[i, d] * E[j, d]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = acc / (n[i] * n[j])
        keep = cos >= margin
        ia, jb = ids[i[keep]], ids[j[keep]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, jb),
                "id_b": np.maximum(ia, jb),
                "_lbl": pdf["_lbl"].iloc[0],
                "_raw": cos[keep],
            }
        )

    return small.groupBy("_lbl").applyInPandas(kern, out_schema)


def neardup_pairs_lsh_blocked(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    bands: int = 24,
    rows_per_band: int = 2,
    seed: int = 42,
    max_bucket: int = 4096,
    direct_block_max: int = 512,
) -> DataFrame:
    """Embedding-cosine near-dup pairs blocked on a hyperplane-LSH
    band bucket: the pair join keys on (label, band_id, bucket), never
    on the label alone — in-block pair count is O((n / (L * 2^r))^2)
    per band instead of O((n/L)^2), and r (``rows_per_band``) dials
    block size down as the corpus grows. Candidates are exactly
    cosine-verified, so precision is always 1; recall is the banded-LSH
    guarantee 1 - (1 - p^r)^bands with p = 1 - theta/pi — at the
    default r=2, b=24 the worst qualifying pair here (cos 0.3,
    p=0.597) misses with probability ~3e-5; measured 100% recall at
    sf0.001/0.01/0.1 (tests/test_dedup.py pins it; r=3, b=32 also
    passed but costs ~1.7x the wall for a weaker bound).

    BLOCK-SIZE-ADAPTIVE ROUTING (``direct_block_max``): banding only
    pays for itself when a block is big enough that pruning beats the
    candidate machinery's overhead. A block of n rows costs ~n^2/2
    exact dots on the direct path, vs bands*n explode rows + groupBy +
    pair-distinct + the same verified dots on the banded path — and at
    a weak threshold (cos 0.3 => per-band agree probability ~0.36) the
    bands prune almost nothing, so for small blocks the banded path is
    strictly overhead (measured at sf0.1: 199,307 of 199,000 possible
    pairs survived banding — 0% pruning for ~1.6 s of candidate work).
    Blocks with <= ``direct_block_max`` rows therefore take the exact
    all-pairs equi-join on the block key; only larger blocks enter the
    LSH signature -> band-bucket -> verify pipeline. This is the
    production fuzzy-dedup layout: the quadratic risk LSH exists to
    kill only materializes past a block size, and below it all-pairs
    is both exact and cheaper. ``direct_block_max=0`` forces every
    block through LSH (the recall test pins that route's equality).

    Banded route, same shape as minhash_lsh_pairs: signature map
    (Arrow matmul, see :func:`lsh_band_buckets_udf`) -> posexplode to
    (band_id, bucket) rows -> groupBy block key + in-group pair
    expansion (one shuffle) -> distinct candidate id-pairs -> exact
    verify join. ``max_bucket`` caps degenerate buckets exactly like
    the minhash path. (A first-agreeing-band emission that avoids the
    distinct was benchmarked and LOST: carrying the band array through
    the groupBy plus the per-candidate fold costs more than a distinct
    over id pairs, which shuffles ~16 bytes per candidate.)
    """
    if direct_block_max <= 0:
        # the probe below subsumes this check on the adaptive path
        check_dim(vectors, vec_col, dim)
    raw = vectors.select(id_col, F.col(label_col).alias("_lbl"), vec_col)

    # --- stage 0, EXACT-DEDUP-FIRST (the duplicate-pileup defense,
    # standard in production fuzzy-dedup pipelines): bit-identical
    # vectors agree on every band, so k copies of a vector make every
    # one of its buckets k deep and the candidate stage
    # quadratic-times-bands in k — tools/scale_smoke.py measured 58x
    # wall for a 16x corpus of exact copies. Identical vectors are
    # grouped by a 128-bit content digest (two seeded xxhash64s;
    # collision odds ~2^-128, the same exactness budget as hashed
    # shingles), ONLY the min-id representative enters the LSH/verify
    # machinery, and verified rep pairs fan back out through the
    # member lists at the end. The detection shuffle carries digests,
    # never vectors; a corpus with no duplicates pays one digest
    # aggregation and keeps exactly the old plan shape.
    h1, h2 = F.xxhash64(F.col(vec_col)), F.xxhash64(F.lit(1), F.col(vec_col))
    dup_groups = (
        raw.select(id_col, "_lbl", h1.alias("_h1"), h2.alias("_h2"))
        .groupBy("_lbl", "_h1", "_h2")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_members"))
        .where(F.size("_members") >= 2)
        .select(F.element_at("_members", 1).alias("_rep"), "_lbl", "_members")
        .localCheckpoint(eager=False)  # feeds anti-join + both expansions
    )
    redundant = dup_groups.select(
        F.explode(F.expr("slice(_members, 2, size(_members) - 1)")).alias(id_col)
    )
    # AQE broadcasts this anti-join when duplicates are rare (the
    # common corpus); under heavy pileup the id-keyed shuffle is the
    # linear cost that buys back the quadratic candidate explosion.
    canon = raw.join(redundant, id_col, "left_anti")

    # ONE shared post-anti-join frame feeds the signature stage, both
    # verify sides, and the intra-group expansion: the pre-cast double
    # array + norm are computed once and localCheckpoint'ed, so the
    # parquet scan + anti-join run once instead of three times (the
    # prior three-pruned-scans layout re-executed the anti-join per
    # consumer — measured ~35% of the query's wall at sf0.1). The
    # checkpoint carries (id, label, vector, norm) — exactly what a
    # production job would persist between the signature and verify
    # passes of an LSH dedup; it is bounded by the canonical corpus
    # size, never by pair count.
    nrm_raw = F.sqrt(
        F.aggregate(as_double_array(vec_col), F.lit(0.0), lambda a, x: a + x * x)
    )
    w = (
        canon.select(
            id_col,
            "_lbl",
            as_double_array(vec_col).alias("_e"),
            nrm_raw.alias("_n"),
        )
        .localCheckpoint(eager=False)
    )

    # Route probe: ONE driver action reads (a) how many blocks exceed
    # the direct cutoff — decides whether the banded subplan exists at
    # all — and (b) the min/max vector width, subsuming check_dim's
    # separate probe job. One aggregated row regardless of label
    # cardinality or corpus size.
    if direct_block_max > 0:
        sizes = w.groupBy("_lbl").agg(
            F.count(F.lit(1)).alias("_bn"), F.first(F.size("_e")).alias("_d")
        )
        probe = sizes.agg(
            F.sum((F.col("_bn") > direct_block_max).cast("int")).alias("nbig"),
            F.min("_d").alias("dmin"),
            F.max("_d").alias("dmax"),
        ).head()
        if probe["dmax"] is not None and (probe["dmin"] != dim or probe["dmax"] != dim):
            bad = probe["dmax"] if probe["dmax"] != dim else probe["dmin"]
            raise ValueError(
                f"{vec_col!r} has {bad} elements but dim={dim} was declared"
            )
        n_big = int(probe["nbig"] or 0)
        sizes = sizes.drop("_d")
    else:
        n_big = 1
    wt = w.join(sizes, "_lbl") if (direct_block_max > 0 and n_big > 0) else w

    # exact dot for the banded verify join: zip_with/aggregate FOLDS
    # on purpose — Spark's higher-order functions run as tight JVM
    # array loops, while an unrolled 64-term `a[0]*b[0] + ...`
    # expression was measured ~4x SLOWER (the giant generated method
    # falls off the JIT fast path). Join sides read the shared
    # checkpointed frame, which carries the pre-cast double arrays
    # once per row, not per pair.
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t)

    verified = None
    if direct_block_max > 0:
        # direct route: exact all-pairs within each small block via the
        # Arrow gram-matrix kernel; the engine-side round + threshold
        # here is the decision point (the kernel pre-filters with slack)
        small = wt.where(F.col("_bn") <= direct_block_max).drop("_bn") if n_big > 0 else wt
        verified = (
            _direct_block_pairs(small, id_col, threshold)
            .withColumn("cos_sim", F.round("_raw", 6))
            .where(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "_lbl", "cos_sim")
        )

    if n_big > 0:
        big = wt.where(F.col("_bn") > direct_block_max).drop("_bn") if direct_block_max > 0 else wt
        sig_udf = lsh_band_buckets_udf(dim, bands, rows_per_band, seed)
        sig = big.select(id_col, "_lbl", sig_udf(F.col("_e")).alias("_bkts"))
        buckets = sig.select(
            id_col, "_lbl", F.posexplode("_bkts").alias("band_id", "bucket")
        )
        grouped = (
            buckets.groupBy("_lbl", "band_id", "bucket")
            .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("L"))
            .where((F.size("L") >= 2) & (F.size("L") <= max_bucket))
        )
        from wnv_etl_lab2_spark.operators.dedup import pair_explode

        cand = pair_explode(grouped, "L", "id_a", "id_b", keep=["_lbl"]).distinct()
        va = w.select(
            F.col(id_col).alias("id_a"), F.col("_e").alias("ea"), F.col("_n").alias("na")
        )
        vb = w.select(
            F.col(id_col).alias("id_b"), F.col("_e").alias("eb"), F.col("_n").alias("nb")
        )
        banded = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .withColumn("cos_sim", F.round(dot / (F.col("na") * F.col("nb")), 6))
            .where(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "_lbl", "cos_sim")
        )
        verified = banded if verified is None else verified.unionByName(banded)

    # --- expansion 1: verified rep pairs fan back out to member pairs
    # (cosine unchanged — members are bit-identical to their rep)
    ma = dup_groups.select(F.col("_rep").alias("id_a"), F.col("_members").alias("_ma"))
    mb = dup_groups.select(F.col("_rep").alias("id_b"), F.col("_members").alias("_mb"))
    cross = (
        verified.join(ma, "id_a", "left")
        .join(mb, "id_b", "left")
        .withColumn("_ma", F.coalesce("_ma", F.array("id_a")))
        .withColumn("_mb", F.coalesce("_mb", F.array("id_b")))
        .select(F.explode("_ma").alias("_xa"), "_mb", "_lbl", "cos_sim")
        .select("_xa", F.explode("_mb").alias("_xb"), "_lbl", "cos_sim")
        .select(
            F.least("_xa", "_xb").alias("id_a"),
            F.greatest("_xa", "_xb").alias("id_b"),
            "_lbl",
            "cos_sim",
        )
    )
    # --- expansion 2: within-group pairs (guaranteed duplicates; the
    # self-cosine comes from the rep's own vector through the SAME
    # fold the verify stage uses, so the rounded double matches what
    # the oracle computes for any member pair)
    self_cos = F.round(
        F.aggregate(
            F.zip_with("_e", "_e", lambda x, y: x * y), F.lit(0.0), lambda acc, t: acc + t
        )
        / (F.col("_n") * F.col("_n")),
        6,
    )
    from wnv_etl_lab2_spark.operators.dedup import pair_explode

    intra_src = (
        dup_groups.join(w.select(F.col(id_col).alias("_rep"), "_e", "_n"), "_rep")
        .withColumn("cos_sim", self_cos)
        .where(F.col("cos_sim") >= threshold)
    )
    intra = pair_explode(
        intra_src, "_members", "id_a", "id_b", keep=["_lbl", "cos_sim"]
    ).select("id_a", "id_b", "_lbl", "cos_sim")
    return cross.unionByName(intra).select(
        "id_a", "id_b", F.col("_lbl").alias(label_col), "cos_sim"
    )


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.3,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    sample_size: int = 512,
    seed: int = 42,
    bands: int = 24,
    rows_per_band: int = 2,
    refine_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023, public
    paper): cluster the embeddings with the IVF coarse quantizer, find
    cosine near-dup pairs WITHIN each cluster, group pairs into
    duplicate components, and keep the min-id representative of each
    component. Returns one row per input vector: (id, cluster, keep).

    Composition of already-scale-shaped pieces: centroids train on a
    bounded driver-side sample (standard IVF practice), assignment is
    a pure map, the within-cluster pair join is LSH-band-blocked (the
    cluster id replaces the label as the outer block, so a huge
    cluster still never cross-joins), and components are min-label
    propagation. Cross-cluster near-dups are missed by design — that
    is SemDeDup's published recall trade: the quantizer puts near-dups
    in the same cell with high probability, and k dials cell size.
    """
    v = vectors.select(id_col, as_double_array(vec_col).alias("_e"))
    cents = _trained_centroids(v, id_col, n_clusters, sample_size, seed, refine_iters)
    if cents is None:
        return vectors.select(
            F.col(id_col),
            F.lit(0).alias("cluster"),
            F.lit(True).alias("keep"),
        ).where(F.lit(False))
    assigned = vectors.withColumn(
        "_cluster", ivf_assign_col(as_double_array(vec_col), cents)
    ).localCheckpoint(eager=False)  # pairs + final join both reuse the assignment

    from wnv_etl_lab2_spark.operators.dedup import connected_components

    pairs = neardup_pairs_lsh_blocked(
        assigned,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        label_col="_cluster",
        dim=dim,
        bands=bands,
        rows_per_band=rows_per_band,
        seed=seed,
    )
    comps = connected_components(pairs, src="id_a", dst="id_b").withColumnRenamed(
        "id", id_col
    )
    out = assigned.join(F.broadcast(comps), id_col, "left")
    return out.select(
        F.col(id_col),
        F.col("_cluster").alias("cluster"),
        (F.col("comp_id").isNull() | (F.col("comp_id") == F.col(id_col))).alias("keep"),
    )


def ivf_index_build(
    vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    sample_size: int = 512,
    seed: int = 42,
    refine_iters: int = 0,
) -> None:
    """Build and PERSIST an IVF index: the trained coarse quantizer
    (one parquet of (cluster_id, centroid)) plus the corpus assigned
    to clusters, written `partitionBy(_cl)` — so a probe-limited
    query reads only the probed clusters' FILES via partition
    pruning, not a post-scan filter. This is the
    build-once/query-many deployment shape of production ANN (train
    on a bounded sample, assign distributed at ingest, serve from the
    partitioned layout); `ivf_ann_topk` is the same math inline.

    At 100 TB the vectors write is one full pass (pure map after the
    driver-side quantizer training — same 512-row bounded sample as
    the inline path) and each query touches nprobe/n_clusters of the
    storage. Deterministic: same seed + corpus -> identical index.
    """
    import os

    v = vectors.select(id_col, as_double_array(vec_col).alias("_e"))
    cents = _trained_centroids(v, id_col, n_clusters, sample_size, seed, refine_iters)
    if cents is None:
        raise ValueError("cannot build an IVF index over an empty corpus")
    spark = vectors.sparkSession
    spark.createDataFrame(
        [(ci, c) for ci, c in enumerate(cents)],
        "cluster_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))
    (
        v.withColumn("_cl", ivf_assign_col("_e", cents))
        .write.mode("overwrite")
        .partitionBy("_cl")
        .parquet(os.path.join(index_dir, "vectors"))
    )


def ivf_index_query(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k over a persisted IVF index (see ivf_index_build): rank
    centroids driver-side (they ARE the bounded artifact), read ONLY
    the ``nprobe`` probed cluster partitions (partition pruning — the
    scan lists nprobe directories, verified in tests via inputFiles),
    exact cosine re-rank of the candidates. Identical results to the
    inline `ivf_ann_topk` for the same corpus/seed, pinned in
    tests/test_ann_index.py."""
    import os

    cents_rows = (
        spark.read.parquet(os.path.join(index_dir, "centroids"))
        .orderBy("cluster_id")
        .collect()
    )
    cents = [[float(x) for x in r["centroid"]] for r in cents_rows]
    qd = [sum((a - b) * (a - b) for a, b in zip(query_vec, c)) for c in cents]
    probes = [ci for ci, _ in sorted(enumerate(qd), key=lambda t: t[1])[:nprobe]]
    vecs = spark.read.parquet(os.path.join(index_dir, "vectors")).where(
        F.col("_cl").isin(probes)
    )
    nv = F.sqrt(F.aggregate(F.col("_e"), F.lit(0.0), lambda a, x: a + x * x))
    sim = vecs.where(nv > 0).select(
        id_col, F.round(cosine_to_query(F.col("_e"), query_vec), 6).alias("cos_sim")
    )
    return sim.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def ivfpq_index_build(
    vectors: DataFrame,
    index_dir: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_version: int | None = None,
) -> None:
    """Build and PERSIST an IVFADC index (round 12 — the persisted
    twin of `ivfpq_topk_pretrained`, completing the build-once/
    query-many deployment shape the IVF index established): ONE
    parquet table partitioned by coarse cell (``_cl=``) whose rows
    carry (id, residual PQ codes, full vector). Because parquet is
    columnar, the ADC serve scan reads ONLY the code column of the
    probed partitions — partition pruning cuts the files, column
    pruning cuts the bytes to ~8 codes/vector — while the refine stage
    fetches the full vectors of just the shortlist from the same
    table. Assignment + residual encode are pure JVM maps at build
    (one corpus pass); deterministic for fixed constants.

    ``source_version`` (round 13) stamps a sidecar with the source
    table's version, so serves can demand freshness
    (`ivfpq_index_query(expect_source_version=...)`) and
    `ivfpq_index_append` maintains the index incrementally."""
    cent_arr = _const_array2(centroids)
    (
        vectors.select(id_col, as_double_array(vec_col).alias("_e"))
        .withColumn("_cl", ivf_assign_col("_e", centroids))
        .withColumn(
            "_res",
            F.zip_with(
                F.col("_e"),
                F.element_at(cent_arr, F.col("_cl") + 1),
                lambda a, b: a - b,
            ),
        )
        .withColumn("_codes", pq_encode_col("_res", codebooks))
        .drop("_res")
        .write.mode("overwrite")
        .partitionBy("_cl")
        .parquet(index_dir)
    )
    meta = {"n_cells": len(centroids), "m": len(codebooks)}
    if source_version is not None:
        meta["source_version"] = int(source_version)
    _ivfpq_write_meta(index_dir, meta)


def _ivfpq_meta_path(index_dir: str) -> str:
    import os

    return os.path.join(index_dir, "_index_meta.json")


def _ivfpq_write_meta(index_dir: str, meta: dict) -> None:
    import json as _json

    with open(_ivfpq_meta_path(index_dir), "w") as f:
        _json.dump(meta, f, sort_keys=True)


def ivfpq_index_meta(index_dir: str) -> dict | None:
    """The index's sidecar metadata ({source_version, n_cells, m}), or
    None for an index built without stamping."""
    import json as _json
    import os

    p = _ivfpq_meta_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return _json.load(f)


def ivfpq_index_append(
    new_vectors: DataFrame,
    index_dir: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_version: int | None = None,
) -> None:
    """INCREMENTAL IVFADC index maintenance (round 13 — r12 verdict
    #4): assign + residual-encode ONLY the new batch and append its
    rows into the existing cell partitions — O(new batch) compute and
    IO; every previously-written index file is untouched (pinned in
    tests/test_ann_index.py by file-list identity). Because assignment
    and encoding are deterministic per-row functions of the FIXED
    constants (centroids/codebooks), append == rebuild exactly: the
    same corpus yields the same index content either way, so serves
    need no rebuild fence. ``source_version`` re-stamps the sidecar so
    `ivfpq_index_query(expect_source_version=...)` can refuse a stale
    serve after source DML the maintainer has not yet applied.

    At 100 TB this is the ingest path: a micro-batch of new embeddings
    costs one map over the batch plus a hive append into nprobe-prunable
    cell dirs — the index never rebuilds for growth (re-TRAINING the
    constants on drifted data is the separate, deliberate act)."""
    cent_arr = _const_array2(centroids)
    (
        new_vectors.select(id_col, as_double_array(vec_col).alias("_e"))
        .withColumn("_cl", ivf_assign_col("_e", centroids))
        .withColumn(
            "_res",
            F.zip_with(
                F.col("_e"),
                F.element_at(cent_arr, F.col("_cl") + 1),
                lambda a, b: a - b,
            ),
        )
        .withColumn("_codes", pq_encode_col("_res", codebooks))
        .drop("_res")
        .write.mode("append")
        .partitionBy("_cl")
        .parquet(index_dir)
    )
    meta = ivfpq_index_meta(index_dir) or {
        "n_cells": len(centroids), "m": len(codebooks)
    }
    if source_version is not None:
        meta["source_version"] = int(source_version)
    _ivfpq_write_meta(index_dir, meta)


def ivfpq_index_query(
    spark,
    index_dir: str,
    query_vec: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    id_col: str = "vec_id",
    expect_source_version: int | None = None,
) -> DataFrame:
    """Top-k over a persisted IVFADC index: rank cells driver-side,
    scan ONLY the probed partitions' CODE column (partition pruning +
    column pruning — the embedding column never leaves disk during the
    shortlist pass), ADC via per-cell LUT constants, then fetch just
    the ``shortlist`` winners' full vectors for the exact squared-L2
    re-rank. Identical results to the inline `ivfpq_topk_refined` for
    the same corpus/constants (pinned in tests/test_ann_index.py).

    ``expect_source_version`` (round 13): refuse a STALE serve — when
    the caller knows the source table's current version (e.g.
    `versioned.latest_version`), a sidecar stamp mismatch raises
    instead of silently answering from an index that predates source
    DML the maintainer has not applied yet."""
    if expect_source_version is not None:
        meta = ivfpq_index_meta(index_dir)
        stamped = (meta or {}).get("source_version")
        if stamped != int(expect_source_version):
            raise ValueError(
                f"stale IVFPQ index at {index_dir}: stamped "
                f"source_version={stamped}, caller expects "
                f"{expect_source_version} — run ivfpq_index_append (or "
                "rebuild) to catch up"
            )
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    qd = [sum((a - b) * (a - b) for a, b in zip(query_vec, c)) for c in centroids]
    probes = [ci for ci, _ in sorted(enumerate(qd), key=lambda t: (t[1], t[0]))[:nprobe]]
    lut = [
        [
            [
                sum(
                    ((query_vec[s * sub_dim + i] - c[s * sub_dim + i]) - w[i]) ** 2
                    for i in range(sub_dim)
                )
                for w in book
            ]
            for s, book in enumerate(codebooks)
        ]
        for c in centroids
    ]
    codes = spark.read.parquet(index_dir).where(F.col("_cl").isin(probes))
    adc = F.lit(0.0)
    for s in range(m):
        table_s = _const_array2([lut[c][s] for c in range(len(centroids))])
        adc = adc + F.element_at(
            F.element_at(table_s, F.col("_cl") + 1),
            F.element_at(F.col("_codes"), s + 1) + 1,
        )
    cands = (
        codes.select(F.col(id_col), F.round(adc, 6).alias("_adc"))
        .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
        .limit(shortlist)
        .select(id_col)
    )
    qa = _const_array(query_vec)
    exact = (
        spark.read.parquet(index_dir)
        .join(F.broadcast(cands), id_col)
        .select(
            F.col(id_col),
            F.round(
                F.aggregate(
                    F.zip_with(F.col("_e"), qa, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("l2_dist"),
        )
    )
    return exact.orderBy(F.col("l2_dist").asc(), F.col(id_col).asc()).limit(k)


def pq_encode_sql(vec_col: str, codebooks: list[list[list[float]]]) -> str:
    """`pq_encode_col`'s full-string form as a raw SQL fragment, so
    composite single-parse plans (ivfpq_topk_pretrained) can let-bind
    it instead of paying a separate Dataset-op analysis pass. Each
    subspace's distance array is let-bound — array_position +
    array_min read ONE evaluated copy instead of computing the K
    distances twice."""
    sub_dim = len(codebooks[0][0])

    def code(s: int, book) -> str:
        sub = f"slice({vec_col}, {s * sub_dim + 1}, {sub_dim})"

        def dist(c) -> str:
            arr = "array(" + ", ".join(f"{float(v)!r}D" for v in c) + ")"
            return (
                f"aggregate(zip_with({sub}, {arr}, (a, b) -> (a - b) * (a - b)), "
                "0.0D, (acc, x) -> acc + x)"
            )

        dists = "array(" + ", ".join(dist(c) for c in book) + ")"
        return (
            f"transform(array({dists}), _pqd -> "
            "CAST(array_position(_pqd, array_min(_pqd)) - 1 AS INT))[0]"
        )

    return "array(" + ", ".join(code(s, b) for s, b in enumerate(codebooks)) + ")"


def pq_encode_col(vec_col, codebooks: list[list[list[float]]]):
    """Product-quantization ENCODE as a pure JVM expression: split the
    vector into M contiguous subvectors, and per subspace emit the
    index of its nearest codebook centroid (squared L2; ties break to
    the lowest code on every engine — `array_position` returns the
    FIRST minimum). Returns an array<int> column of M codes. Zero
    shuffle, zero Python: at 100 TB encoding is a map fused into the
    scan, exactly how a vector store quantizes at ingest."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    if isinstance(vec_col, str):
        # FULL-STRING fast path (round 12; see ivf_assign_col): the
        # whole M x K x sub_dim encode is one parsed SQL expression.
        return F.expr(pq_encode_sql(vec_col, codebooks))
    codes = []
    for s, book in enumerate(codebooks):
        sub = F.slice(vec_col, s * sub_dim + 1, sub_dim)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(sub, _const_array(c), lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in book
            ]
        )
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return F.array(*codes)


def pq_topk_pretrained(
    vectors: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over pre-trained PQ codebooks —
    the IVF-pretrained precedent extended to product quantization:
    each corpus vector collapses to M codebook indices (`pq_encode_col`,
    a pure map), the query's distance to every codebook centroid is a
    driver-side M x K lookup table of CONSTANTS, and the approximate
    distance is the LEFT-FOLD sum of M table lookups — so ranking
    costs O(M) per row instead of O(d), reads codes instead of
    vectors, and the whole plan is one scan + TakeOrdered. The fold
    order is fixed (s = 0..M-1) so an oracle replaying the same
    constants matches bit-for-bit."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    lut = [
        [
            sum(
                (query_vec[s * sub_dim + i] - c[i]) ** 2
                for i in range(sub_dim)
            )
            for c in book
        ]
        for s, book in enumerate(codebooks)
    ]
    v = vectors.select(
        F.col(id_col), as_double_array(vec_col).alias("_pqv")
    ).select(F.col(id_col), pq_encode_col("_pqv", codebooks).alias("_codes"))
    adc = F.lit(0.0)
    for s in range(m):
        table = _const_array(lut[s])
        adc = adc + F.element_at(table, F.element_at(F.col("_codes"), s + 1) + 1)
    return (
        v.select(F.col(id_col), F.round(adc, 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_topk_pretrained(
    vectors: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the IVFADC composition (Jegou,
    Douze & Schmid, TPAMI 2011; round 12): the coarse quantizer
    absorbs each vector's cell position, PQ encodes only the residual
    e - centroid(e), and the asymmetric distance uses a PER-CELL
    lookup table built from the query's residual against that cell.
    Residual energy is strictly smaller than raw-vector energy, so the
    same M x K codebook budget resolves finer structure — pure-ADC
    recall beats raw-vector PQ at the identical 8-bytes-per-vector
    budget (measured in SCALING.md §Similarity).

    Scale shape: the whole code scan (cell assign, nprobe filter,
    residual encode, LUT-summed ADC) is ONE Arrow map over exactly the
    (id, vector) columns — still zero shuffle, still embarrassingly
    parallel, with ranking one TakeOrdered heap over the kernel's
    output. Round 18 (guide §4.2) moved the kernel from generated SQL
    higher-order folds to numpy: HOFs never enter whole-stage codegen,
    so the 16 assignment folds + M x K encode folds per row ran
    interpreted (~0.5 s/exec at sf0.1), and the ~33k-double LUT
    literals made every plan build parse a megabyte of SQL
    (~0.3 s/build) — the Arrow form ships the same constants via the
    task closure and runs the arithmetic as BLAS-free vectorized
    numpy (measured 0.81 -> 0.28 s build+exec, bit-identical top-k at
    all three SFs).

    Bit-exactness contract (same discipline as _direct_block_pairs):
    every accumulation runs DIMENSION-SEQUENTIALLY (acc += term_d, d
    in order) and the subquantizer fold s = 0..M-1 in order, exactly
    the JVM aggregate/zip_with fold the oracle replays; argmin takes
    the FIRST minimum (numpy argmin == array_position of array_min);
    the float32 -> float64 widening is exact on both paths; and the
    round(. , 6) stays on the JVM so decimal rounding never enters
    Python."""
    import numpy as np

    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    dim = m * sub_dim
    # driver-side probe ranking (centroids ARE the bounded artifact)
    qd = [
        sum((a - b) * (a - b) for a, b in zip(query_vec, c)) for c in centroids
    ]
    probes = [ci for ci, _ in sorted(enumerate(qd), key=lambda t: (t[1], t[0]))[:nprobe]]
    # per-cell LUT over the query RESIDUAL: lut[c][s][k] =
    # ||(q - cent_c)_s - codeword_sk||^2 — python-float math, identical
    # values to the literals the retired SQL form embedded
    lut = [
        [
            [
                sum(
                    (
                        (query_vec[s * sub_dim + i] - c[s * sub_dim + i])
                        - w[i]
                    )
                    ** 2
                    for i in range(sub_dim)
                )
                for w in book
            ]
            for s, book in enumerate(codebooks)
        ]
        for c in centroids
    ]
    C = np.array(centroids, dtype=np.float64)
    B = np.array(codebooks, dtype=np.float64)  # (m, K, sub_dim)
    LUT = np.array(lut, dtype=np.float64)      # (cells, m, K)
    probe_arr = np.array(probes, dtype=np.int64)

    def kern(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = b.column(0)
            vec = b.column(1)
            flat = vec.flatten()
            if len(flat) == n * dim and flat.null_count == 0:
                E = flat.to_numpy(zero_copy_only=False).reshape(n, dim).astype(
                    np.float64
                )
            else:  # ragged/null rows: exact slow path
                E = np.asarray(vec.to_pylist(), dtype=np.float64)
            # assign: dimension-sequential accumulation (JVM fold order)
            dmat = np.zeros((n, C.shape[0]))
            for d in range(dim):
                dmat += (E[:, d : d + 1] - C[None, :, d]) ** 2
            cl = np.argmin(dmat, axis=1)  # first minimum, like array_position
            mask = np.isin(cl, probe_arr)
            if not mask.any():
                continue
            Em, clm = E[mask], cl[mask]
            idm = ids.filter(pa.array(mask))
            R = Em - C[clm]
            adc = np.zeros(len(Em))
            for s in range(m):  # fixed s = 0..M-1 fold order
                sub = R[:, s * sub_dim : (s + 1) * sub_dim]
                dcb = np.zeros((len(Em), B.shape[1]))
                for d in range(sub_dim):
                    dcb += (sub[:, d : d + 1] - B[None, s, :, d]) ** 2
                codes = np.argmin(dcb, axis=1)
                adc = adc + LUT[clm, s, codes]
            yield pa.record_batch(
                [idm, pa.array(adc, type=pa.float64())],
                names=[id_col, "adc_dist"],
            )

    id_type = vectors.schema[id_col].dataType.simpleString()
    out = vectors.select(id_col, vec_col).mapInArrow(
        kern, f"`{id_col}` {id_type}, adc_dist double"
    )
    return (
        out.select(F.col(id_col), F.round("adc_dist", 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_topk_refined(
    vectors: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC serve path with exact refinement (round 12): residual-PQ
    ADC over the probed cells shortlists ``shortlist`` candidates,
    then only those rows' full vectors are fetched for an exact
    squared-L2 re-rank of the final top-k — nprobe prunes the scan,
    PQ's byte reduction prices the shortlist pass, and the exact pass
    touches a constant ``shortlist`` rows. Deterministic end to end
    (ADC and exact ties both break to the lowest id)."""
    cands = ivfpq_topk_pretrained(
        vectors, query_vec, centroids, codebooks,
        k=shortlist, nprobe=nprobe, id_col=id_col, vec_col=vec_col,
    ).select(id_col)
    qa = _const_array(query_vec)
    exact = (
        vectors.join(F.broadcast(cands), id_col)
        .select(
            F.col(id_col),
            F.round(
                F.aggregate(
                    F.zip_with(
                        as_double_array(vec_col), qa, lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("l2_dist"),
        )
    )
    return exact.orderBy(F.col("l2_dist").asc(), F.col(id_col).asc()).limit(k)


def pq_topk_refined(
    vectors: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ serve path with REFINEMENT — the production two-stage shape:
    ADC over the 8-byte codes shortlists ``shortlist`` candidates
    (cheap scan of 1.5% of the raw bytes), then ONLY those candidates'
    full vectors are fetched for an exact squared-L2 re-rank of the
    final top-k. This is how vector stores spend PQ's byte savings
    without eating its recall loss: the exact pass touches
    ``shortlist`` rows, not the corpus. Deterministic end to end
    (ADC ties break to the lowest id; exact ties likewise), so an
    oracle can replay both stages."""
    cands = pq_topk_pretrained(
        vectors, query_vec, codebooks, k=shortlist, id_col=id_col, vec_col=vec_col
    ).select(id_col)
    qa = _const_array(query_vec)
    exact = (
        vectors.join(F.broadcast(cands), id_col)
        .select(
            F.col(id_col),
            F.round(
                F.aggregate(
                    F.zip_with(
                        as_double_array(vec_col), qa, lambda a, b: (a - b) * (a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("l2_dist"),
        )
    )
    return exact.orderBy(F.col("l2_dist").asc(), F.col(id_col).asc()).limit(k)
