"""Ground truth for the Catalyst polygon kernel (operators/geometry.py):
an independent pure-Python Sutherland-Hodgman + shoelace implementation,
run over hand-built convex cases the oracle-side interval arithmetic of
`polygon_clip_area` can NOT cover (triangles, hexagons, edge-touching)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.operators.geometry import (
    clip_area_col,
    clip_convex_sql,
    poly_area_sql,
    rect_poly_sql,
)


def ref_clip(subject: list[tuple], clip: list[tuple]) -> list[tuple]:
    """Reference Sutherland-Hodgman (CCW convex clip)."""
    out = list(subject)
    m = len(clip)
    for j in range(m):
        ax, ay = clip[j]
        bx, by = clip[(j + 1) % m]
        if not out:
            break
        nxt_out = []
        n = len(out)
        for i in range(n):
            cx, cy = out[i]
            nx, ny = out[(i + 1) % n]
            d_cur = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            d_nxt = (bx - ax) * (ny - ay) - (by - ay) * (nx - ax)
            if (d_cur >= 0) != (d_nxt >= 0):
                t = d_cur / (d_cur - d_nxt)
                nxt_out.append((cx + t * (nx - cx), cy + t * (ny - cy)))
            if d_nxt >= 0:
                nxt_out.append((nx, ny))
        out = nxt_out
    return out


def ref_area(poly: list[tuple]) -> float:
    if len(poly) < 3:
        return 0.0
    s = 0.0
    n = len(poly)
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        s += x0 * y1 - x1 * y0
    return abs(s) / 2.0


def poly_sql(pts: list[tuple]) -> str:
    return (
        "array("
        + ", ".join(
            f"named_struct('x', CAST({x!r} AS DOUBLE), 'y', CAST({y!r} AS DOUBLE))"
            for x, y in pts
        )
        + ")"
    )


SQUARE = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
TRIANGLE = [(-0.5, 0.5), (1.5, 0.5), (0.5, 2.0)]
HEXAGON = [
    (math.cos(k * math.pi / 3) * 0.8 + 0.5, math.sin(k * math.pi / 3) * 0.8 + 0.5)
    for k in range(6)
]
CASES = [
    ("tri_x_square", TRIANGLE, SQUARE),
    ("hex_x_square", HEXAGON, SQUARE),
    ("square_x_hex", SQUARE, HEXAGON),
    ("contained", [(0.2, 0.2), (0.8, 0.2), (0.5, 0.9)], SQUARE),
    ("disjoint", [(5.0, 5.0), (6.0, 5.0), (5.5, 6.0)], SQUARE),
    ("edge_touch", [(1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0)], SQUARE),
]


@pytest.mark.parametrize("name,subj,clip", CASES, ids=[c[0] for c in CASES])
def test_clip_matches_reference(spark, name, subj, clip):
    row = (
        spark.range(1)
        .select(F.expr(clip_convex_sql(poly_sql(subj), poly_sql(clip))).alias("ring"))
        .collect()[0]
    )
    got = [(v.x, v.y) for v in row.ring]
    want = ref_clip(subj, clip)
    assert len(got) == len(want), f"{name}: {got} vs {want}"
    for (gx, gy), (wx, wy) in zip(got, want):
        assert abs(gx - wx) < 1e-12 and abs(gy - wy) < 1e-12
    assert abs(ref_area(got) - ref_area(want)) < 1e-12


@pytest.mark.parametrize("name,subj,clip", CASES, ids=[c[0] for c in CASES])
def test_area_matches_reference(spark, name, subj, clip):
    df = spark.range(1).select(
        F.expr(poly_sql(subj)).alias("s"), F.expr(poly_sql(clip)).alias("c")
    )
    got = df.select(clip_area_col("s", "c", ndigits=12).alias("a")).collect()[0].a
    assert got == pytest.approx(ref_area(ref_clip(subj, clip)), abs=1e-9)


def test_zero_and_degenerate_area(spark):
    """< 3 vertices -> area 0; empty ring -> area 0 (no crash)."""
    rows = spark.sql(
        f"SELECT {poly_area_sql(poly_sql([(1.0, 1.0), (2.0, 2.0)]))} AS two, "
        f"{poly_area_sql('CAST(array() AS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)')} AS empty"
    ).collect()[0]
    assert rows.two == 0.0 and rows.empty == 0.0


CONCAVE = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (1.0, 0.5), (0.0, 2.0)]  # dart
CW_SQUARE = list(reversed(SQUARE))


@pytest.mark.parametrize(
    "name,bad_clip",
    [("concave", CONCAVE), ("clockwise", CW_SQUARE), ("two_vertices", SQUARE[:2])],
)
def test_clip_area_rejects_invalid_clip_ring(spark, name, bad_clip):
    """Sutherland-Hodgman precondition is guarded, not assumed: a
    concave, CW, or degenerate clip ring fails loud at execution
    instead of silently returning a wrong area."""
    df = spark.range(1).select(
        F.expr(poly_sql(TRIANGLE)).alias("s"), F.expr(poly_sql(bad_clip)).alias("c")
    )
    with pytest.raises(Exception, match="convex CCW ring"):
        df.select(clip_area_col("s", "c").alias("a")).collect()


def test_clip_area_guard_accepts_collinear_convex(spark):
    """Collinear vertices (cross == 0) on an otherwise convex CCW ring
    pass the guard and clip identically to the minimal ring."""
    square_extra = [(0.0, 0.0), (0.5, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    df = spark.range(1).select(
        F.expr(poly_sql(TRIANGLE)).alias("s"),
        F.expr(poly_sql(square_extra)).alias("c"),
    )
    got = df.select(clip_area_col("s", "c", ndigits=12).alias("a")).collect()[0].a
    assert got == pytest.approx(ref_area(ref_clip(TRIANGLE, SQUARE)), abs=1e-9)


def test_polygon_clip_area_query_positive(spark, sf_dir):
    """Registry query sanity beyond the oracle: every clipped area is
    positive (the join demands positive overlap) and bounded by the
    smaller box area (0.005^2 parcels)."""
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["polygon_clip_area"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.clip_area <= 0.005 * 0.005 + 1e-12


# --- general (concave) clip: signed fan decomposition -----------------

from wnv_etl_lab2_spark.operators.geometry import clip_area_general_col  # noqa: E402

# L-shape: [0,4]x[0,2] ∪ [0,2]x[2,4] (area 12). Concave at (2,2).
L_SHAPE = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)]
# Comb: [0,6]x[0,4] minus slots [2,3]x[1,4] and [4,5]x[1,4] (area 18).
# NOT star-shaped from any vertex — the case plain fan triangulation
# (unsigned) gets wrong and ear clipping exists to solve.
COMB = [
    (0.0, 0.0), (6.0, 0.0), (6.0, 4.0), (5.0, 4.0), (5.0, 1.0), (4.0, 1.0),
    (4.0, 4.0), (3.0, 4.0), (3.0, 1.0), (2.0, 1.0), (2.0, 4.0), (0.0, 4.0),
]

GENERAL_CASES = [
    # (name, subject, clip, expected area) — goldens by rectilinear
    # decomposition: intersection = sum of box-overlap interval products
    ("L_x_square", [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)], L_SHAPE, 3.0),
    ("L_cw_ring", [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)], list(reversed(L_SHAPE)), 3.0),
    ("comb_contained", [(-1.0, -1.0), (7.0, -1.0), (7.0, 5.0), (-1.0, 5.0)], COMB, 18.0),
    ("comb_x_slab", [(1.5, 0.5), (4.5, 0.5), (4.5, 2.0), (1.5, 2.0)], COMB, 3.0),
    ("comb_disjoint", [(10.0, 10.0), (11.0, 10.0), (10.5, 11.0)], COMB, 0.0),
    ("comb_inside_slot", [(2.2, 2.0), (2.8, 2.0), (2.8, 3.0), (2.2, 3.0)], COMB, 0.0),
]


@pytest.mark.parametrize(
    "name,subj,clip,want", GENERAL_CASES, ids=[c[0] for c in GENERAL_CASES]
)
def test_general_clip_concave_goldens(spark, name, subj, clip, want):
    df = spark.range(1).select(
        F.expr(poly_sql(subj)).alias("s"), F.expr(poly_sql(clip)).alias("c")
    )
    got = df.select(clip_area_general_col("s", "c", ndigits=9).alias("a")).collect()[0].a
    assert got == pytest.approx(want, abs=1e-9)


@pytest.mark.parametrize("name,subj,clip", CASES, ids=[c[0] for c in CASES])
def test_general_clip_agrees_with_convex_path(spark, name, subj, clip):
    """On convex clip rings the general path must reproduce the
    SH-direct result exactly (same SH kernel under the fan)."""
    df = spark.range(1).select(
        F.expr(poly_sql(subj)).alias("s"), F.expr(poly_sql(clip)).alias("c")
    )
    a_gen = df.select(clip_area_general_col("s", "c", ndigits=12).alias("a")).collect()[0].a
    a_cvx = df.select(clip_area_col("s", "c", ndigits=12).alias("a")).collect()[0].a
    assert a_gen == pytest.approx(a_cvx, abs=1e-10)


def test_general_clip_null_and_degenerate(spark):
    df = spark.range(1).select(
        F.expr(poly_sql(SQUARE)).alias("s"),
        F.expr("CAST(NULL AS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)").alias("cnull"),
        F.expr(poly_sql([(0.0, 0.0), (1.0, 1.0)])).alias("c2"),
    )
    row = df.select(
        clip_area_general_col("s", "cnull").alias("an"),
        clip_area_general_col("s", "c2").alias("a2"),
    ).collect()[0]
    assert row.an is None and row.a2 is None


def test_general_clip_random_staircase_polygons(spark):
    """Randomized (seeded) property check: 40 random CONCAVE
    rectilinear 'histogram outline' polygons clipped by random boxes.
    The reference value is independent interval arithmetic — the
    histogram is a union of disjoint columns, so the intersection
    area is a sum of per-column box overlaps, computed without any
    polygon code."""
    import random

    rng = random.Random(421)
    cases = []
    for _ in range(40):
        W = rng.randint(3, 7)
        hs = [round(rng.uniform(0.5, 5.0), 3) for _ in range(W)]
        ring = [(0.0, 0.0), (float(W), 0.0), (float(W), hs[W - 1])]
        for i in range(W - 1, 0, -1):
            ring.append((float(i), hs[i]))
            ring.append((float(i), hs[i - 1]))
        ring.append((0.0, hs[0]))
        # drop consecutive duplicates (equal adjacent heights)
        dedup = [p for k, p in enumerate(ring) if p != ring[(k - 1) % len(ring)]]
        x0 = round(rng.uniform(-1.0, W - 0.5), 3)
        x1 = round(x0 + rng.uniform(0.5, W + 1.0), 3)
        y0 = round(rng.uniform(-1.0, 4.0), 3)
        y1 = round(y0 + rng.uniform(0.5, 6.0), 3)
        box = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        want = sum(
            max(0.0, min(x1, i + 1.0) - max(x0, float(i)))
            * max(0.0, min(y1, hs[i]) - max(y0, 0.0))
            for i in range(W)
        )
        cases.append((box, dedup, want))

    df = spark.createDataFrame(
        [(s, c) for s, c, _ in cases],
        "s array<struct<x:double,y:double>>, c array<struct<x:double,y:double>>",
    )
    got = [
        r.a
        for r in df.select(
            clip_area_general_col("s", "c", ndigits=12).alias("a")
        ).collect()
    ]
    for (box, ring, want), a in zip(cases, got):
        assert a == pytest.approx(want, abs=1e-8), (box, ring, want, a)


def test_general_clip_self_intersecting_is_winding_signed(spark):
    """Out-of-contract input, documented behavior: a self-intersecting
    bow-tie has lobes of winding +1 and -1, so the signed-fan sum is
    their DIFFERENCE (here exactly 0), not the geometric union — the
    identity the kernel is built on only equals area for simple
    rings. This test pins the documented failure mode so a future
    'fix' cannot silently change it without reading the contract."""
    bowtie = [(0.0, 0.0), (2.0, 0.0), (0.0, 2.0), (2.0, 2.0)]
    big = [(-1.0, -1.0), (3.0, -1.0), (3.0, 3.0), (-1.0, 3.0)]
    df = spark.range(1).select(
        F.expr(poly_sql(big)).alias("s"), F.expr(poly_sql(bowtie)).alias("c")
    )
    got = df.select(clip_area_general_col("s", "c", ndigits=9).alias("a")).collect()[0].a
    assert got == pytest.approx(0.0, abs=1e-9)


# --- polygon-with-holes clip: winding additivity ----------------------

from wnv_etl_lab2_spark.operators.geometry import (  # noqa: E402
    clip_area_with_holes_col,
)

# Square [0,4]^2 with center hole [1,3]^2 (net area 12).
SQ4 = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
HOLE_C = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)]
# Comb (area 18) with a hole in its left tooth: [0.5,1.5]x[1.5,3.5].
COMB_HOLE = [(0.5, 1.5), (1.5, 1.5), (1.5, 3.5), (0.5, 3.5)]

HOLED_CASES = [
    # (name, subject, outer, holes, expected) — goldens by rectilinear
    # decomposition (outer overlap minus per-hole overlaps).
    ("contains_all", [(-1.0, -1.0), (5.0, -1.0), (5.0, 5.0), (-1.0, 5.0)],
     SQ4, [HOLE_C], 12.0),
    ("inside_hole", [(1.5, 1.5), (2.5, 1.5), (2.5, 2.5), (1.5, 2.5)],
     SQ4, [HOLE_C], 0.0),
    # box [0.5,2.5]x[0.5,2.5]: outer overlap 4.0, hole overlap 1.5^2
    ("straddles_hole", [(0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5)],
     SQ4, [HOLE_C], 4.0 - 2.25),
    ("cw_hole_ring", [(0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5)],
     SQ4, [list(reversed(HOLE_C))], 4.0 - 2.25),
    # two disjoint holes [1,1.5]x[1,3] and [2.5,3]x[1,3] under a
    # containing subject: 16 - 1 - 1 = 14
    ("two_holes", [(-1.0, -1.0), (5.0, -1.0), (5.0, 5.0), (-1.0, 5.0)], SQ4,
     [[(1.0, 1.0), (1.5, 1.0), (1.5, 3.0), (1.0, 3.0)],
      [(2.5, 1.0), (3.0, 1.0), (3.0, 3.0), (2.5, 3.0)]], 14.0),
    # concave OUTER with a hole: comb fully covered minus tooth hole
    ("comb_with_hole", [(-1.0, -1.0), (7.0, -1.0), (7.0, 5.0), (-1.0, 5.0)],
     COMB, [COMB_HOLE], 18.0 - 2.0),
    # slab y in [0.5, 2.0] across the comb with the tooth hole:
    # comb∩slab = 3 teeth * 1.0 wide... decomposition: comb∩slab area
    # (from comb_x_slab logic over full width): columns [0,2],[3,4],
    # [5,6] full height in slab: [0,2]x[0.5,2]=3.0, [2,3]x[0.5,1]=0.5,
    # [3,4]x... comb = [0,6]x[0,4] minus slots [2,3]x[1,4], [4,5]x[1,4]
    # slab [0,6]x[0.5,2]: full 9.0 minus slot overlaps 2*(1x1)=2 -> 7.0
    # hole overlap: [0.5,1.5]x[1.5,2] = 0.5 -> 6.5
    ("comb_slab_hole", [(0.0, 0.5), (6.0, 0.5), (6.0, 2.0), (0.0, 2.0)],
     COMB, [COMB_HOLE], 6.5),
]


@pytest.mark.parametrize(
    "name,subj,outer,holes,want", HOLED_CASES, ids=[c[0] for c in HOLED_CASES]
)
def test_holed_clip_goldens(spark, name, subj, outer, holes, want):
    df = spark.createDataFrame(
        [(subj, outer, holes)],
        "s array<struct<x:double,y:double>>, o array<struct<x:double,y:double>>, "
        "h array<array<struct<x:double,y:double>>>",
    )
    got = df.select(
        clip_area_with_holes_col("s", "o", "h", ndigits=9).alias("a")
    ).collect()[0].a
    assert got == pytest.approx(want, abs=1e-9)


def test_holed_clip_null_empty_degenerate_holes(spark):
    """NULL holes column == no holes == empty array; degenerate
    (<3-vertex) or NULL hole entries contribute exactly 0; and the
    no-holes form agrees with clip_area_general_col."""
    df = spark.createDataFrame(
        [([(0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5)], SQ4)],
        "s array<struct<x:double,y:double>>, o array<struct<x:double,y:double>>",
    ).selectExpr(
        "s", "o",
        "CAST(NULL AS ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) AS hnull",
        "CAST(array() AS ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) AS hempty",
        "array(CAST(NULL AS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>), "
        "array(named_struct('x', 1.0D, 'y', 1.0D), named_struct('x', 2.0D, 'y', 2.0D))"
        ") AS hdegen",
    )
    row = df.select(
        clip_area_with_holes_col("s", "o", "hnull", ndigits=9).alias("an"),
        clip_area_with_holes_col("s", "o", "hempty", ndigits=9).alias("ae"),
        clip_area_with_holes_col("s", "o", "hdegen", ndigits=9).alias("ad"),
        clip_area_general_col("s", "o", ndigits=9).alias("ag"),
    ).collect()[0]
    assert row.an == row.ae == row.ad == row.ag == pytest.approx(4.0, abs=1e-9)


def test_holed_zone_clip_query_matches_oracle(spark, sf_dir):
    """End-to-end registry query vs its DuckDB interval-arithmetic
    oracle at the pytest SF (the same compare the driver runs)."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tests")
    import oracle_harness as oh
    from wnv_etl_lab2_spark import queries as q

    q._ensure_loaded()
    spec = q.REGISTRY["holed_zone_clip"]
    sdf = spec.fn(spark, sf_dir).toPandas()
    odf = oh.run_oracle(spec.oracle, sf_dir)
    oh.compare(sdf, odf, "holed_zone_clip")


def test_holed_clip_random_staircase_with_holes(spark):
    """Randomized (seeded) property check for the polygon-with-holes
    kernel: random concave 'histogram outline' outers with 1-2 random
    rectangular interior holes (disjoint by construction — sampled in
    disjoint x-bands under the local column height), clipped by random
    boxes. Reference = per-column interval arithmetic minus per-hole
    box overlaps — no polygon code."""
    import random

    rng = random.Random(4206)
    cases = []
    for _ in range(30):
        W = rng.randint(4, 7)
        hs = [round(rng.uniform(1.5, 5.0), 3) for _ in range(W)]
        ring = [(0.0, 0.0), (float(W), 0.0), (float(W), hs[W - 1])]
        for i in range(W - 1, 0, -1):
            ring.append((float(i), hs[i]))
            ring.append((float(i), hs[i - 1]))
        ring.append((0.0, hs[0]))
        outer = [p for k, p in enumerate(ring) if p != ring[(k - 1) % len(ring)]]
        # holes: one per chosen column, strictly inside that column's
        # rectangle [i, i+1] x [0, hs[i]] -> pairwise disjoint
        holes = []
        for i in rng.sample(range(W), rng.randint(1, 2)):
            x0 = round(i + rng.uniform(0.1, 0.4), 3)
            x1 = round(x0 + rng.uniform(0.1, min(0.5, i + 0.9 - x0)), 3)
            y0 = round(rng.uniform(0.1, hs[i] * 0.4), 3)
            y1 = round(y0 + rng.uniform(0.1, hs[i] * 0.5), 3)
            holes.append([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])
        bx0 = round(rng.uniform(-1.0, W - 0.5), 3)
        bx1 = round(bx0 + rng.uniform(0.5, W + 1.0), 3)
        by0 = round(rng.uniform(-1.0, 4.0), 3)
        by1 = round(by0 + rng.uniform(0.5, 6.0), 3)
        box = [(bx0, by0), (bx1, by0), (bx1, by1), (bx0, by1)]

        def overlap(x0, y0, x1, y1):
            return max(0.0, min(bx1, x1) - max(bx0, x0)) * max(
                0.0, min(by1, y1) - max(by0, y0)
            )

        want = sum(overlap(float(i), 0.0, i + 1.0, hs[i]) for i in range(W))
        for h in holes:
            want -= overlap(h[0][0], h[0][1], h[2][0], h[2][1])
        cases.append((box, outer, holes, want))

    df = spark.createDataFrame(
        [(s, o, h) for s, o, h, _ in cases],
        "s array<struct<x:double,y:double>>, o array<struct<x:double,y:double>>, "
        "h array<array<struct<x:double,y:double>>>",
    )
    from wnv_etl_lab2_spark.operators.geometry import clip_area_with_holes_col

    got = [
        r.a
        for r in df.select(
            clip_area_with_holes_col("s", "o", "h", ndigits=12).alias("a")
        ).collect()
    ]
    for (box, outer, holes, want), a in zip(cases, got):
        assert a == pytest.approx(want, abs=1e-8), (box, outer, holes, want, a)
