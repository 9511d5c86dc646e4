"""General convex-polygon geometry in pure Catalyst expressions.

Closes the reference's arbitrary-polygon overlay surface
(`arcpy.analysis.Intersect` on polygon risk layers,
`/root/reference/GSheetsETL_Lab2.py:125-133`,
`/root/reference/final_project2.py:226-231`): where
`operators/spatial.py` proves answer-equivalence on points and
axis-aligned boxes, this module clips *actual polygons* — a polygon is
an ``array<struct<x:double,y:double>>`` column (vertices in ring
order), intersection is Sutherland–Hodgman clipping (clip polygon must
be convex, the standard SH precondition), and area is the shoelace
formula. Everything is generated SQL over Spark's higher-order
functions: the geometry kernel runs JVM-side inside the join stage —
no Python in the hot path, no geometry library.

Scale shape: callers pair polygons with `bbox_overlap_join`
(grid-bucketed equi-join, `operators/spatial.py:156`) and apply
`clip_area_sql` to the candidate pairs only — the classic
filter-and-refine spatial join. The kernel itself is a pure per-row
expression: no shuffle, no state.

Numerics (why the shoelace is translated): at Boulder-frame
coordinates (~1e2) the raw shoelace cross terms are ~4e3 while the
area is ~4e-4 — catastrophic cancellation leaves ~1e-13 absolute
error, enough to flip a 10-dp ROUND against an oracle that computes
the same area as an interval product. Translating each ring to its own
bbox-min first makes the subtractions exact (Sterbenz: the operands
are within 2x) and the remaining error ~1e-15, dominated by the
clip-vertex interpolation itself. Results are ROUNDed at 8 dp by the
query layer; at 0.02-degree boxes that keeps 4 significant digits.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def rect_poly_sql(x0: str, y0: str, x1: str, y1: str) -> str:
    """A counter-clockwise rectangle ring from bbox fragments/columns
    — the bridge from the box layers in `queries/geo.py` to real
    polygon rings."""
    return (
        "array("
        f"named_struct('x', CAST({x0} AS DOUBLE), 'y', CAST({y0} AS DOUBLE)), "
        f"named_struct('x', CAST({x1} AS DOUBLE), 'y', CAST({y0} AS DOUBLE)), "
        f"named_struct('x', CAST({x1} AS DOUBLE), 'y', CAST({y1} AS DOUBLE)), "
        f"named_struct('x', CAST({x0} AS DOUBLE), 'y', CAST({y1} AS DOUBLE)))"
    )


def let_sql(bound_expr: str, var: str, body: str) -> str:
    """Bind ``bound_expr`` to lambda variable ``var`` inside ``body``
    — `transform(array(e), v -> body)[0]`. This is a let-binding:
    every reference to ``var`` in ``body`` reads the one evaluated
    value. Without it, referencing a computed alias N times makes
    CollapseProject inline (and re-evaluate) the whole expression N
    times — the repo's #1 silent perf killer."""
    return f"transform(array({bound_expr}), {var} -> {body})[0]"


def poly_area_sql(p: str) -> str:
    """Shoelace area of ring variable/column ``p`` (any orientation —
    abs at the end), translated to its own bbox-min (see module
    docstring). Degenerate rings (< 3 vertices) have area 0.0 because
    every cross term cancels."""
    mnx = f"array_min(transform({p}, _v -> _v.x))"
    mny = f"array_min(transform({p}, _v -> _v.y))"
    term = (
        f"(({p}[_i].x - _mx) * ({p}[(_i + 1) % size({p})].y - _my)"
        f" - ({p}[(_i + 1) % size({p})].x - _mx) * ({p}[_i].y - _my))"
    )
    folded = (
        f"CASE WHEN size({p}) < 3 THEN CAST(0.0 AS DOUBLE) ELSE "
        f"0.5 * abs(aggregate(sequence(0, size({p}) - 1), CAST(0.0 AS DOUBLE), "
        f"(_ac, _i) -> _ac + {term})) END"
    )
    return let_sql(mnx, "_mx", let_sql(mny, "_my", folded))


def assert_convex_ccw_sql(clip: str) -> str:
    """Guard the Sutherland–Hodgman precondition: evaluates to ``clip``
    unchanged when it is a convex CCW ring (>= 3 vertices, every
    consecutive-edge cross product >= 0), raises at execution time
    otherwise. Without this, a concave or CW clip ring silently
    produces wrong areas — the half-plane inside-test is only the
    polygon interior when the ring is convex and counter-clockwise.

    The scan is the standard cross-product sign sweep (collinear
    vertices — cross == 0 — are allowed) plus a signed-shoelace-area
    check: all-left-or-straight turns alone would also accept fully
    collinear rings, rings of repeated identical vertices, and CW
    rings, so the signed area must additionally be strictly positive
    (CCW orientation, nonzero extent). Known residual gap: a
    multiply-wound all-left-turn ring passes both checks — detecting
    it needs a total-turning-angle sum, out of scope for axis-aligned
    and convex analytic clips. O(m) per row over rings that are small
    by construction. For arbitrary concave clip polygons use
    `clip_area_general_sql` (signed fan decomposition — no convexity
    precondition); fail-loud here matches the repo policy
    (`operators/dedup.py` connected-components non-convergence).

    A NULL clip ring is short-circuited to NULL (matching the
    unguarded path, where NULL propagates through clip/area
    expressions) rather than tripping the assert with a misleading
    message — relevant for clip columns produced by outer joins.
    """
    m = f"size({clip})"
    m1 = f"greatest({m}, 1)"
    a, b, c = f"{clip}[_k]", f"{clip}[(_k + 1) % {m1}]", f"{clip}[(_k + 2) % {m1}]"
    cross = (
        f"(({b}.x - {a}.x) * ({c}.y - {b}.y)"
        f" - ({b}.y - {a}.y) * ({c}.x - {b}.x))"
    )
    # greatest(m, 1) keeps the sequence bound (and the % m indexing
    # inside the lambda) well-defined for empty rings even if the
    # size >= 3 conjunct were ever evaluated non-lazily; today Spark's
    # AND short-circuits, but the guard must not depend on that.
    idx = f"sequence(0, {m1} - 1)"
    signed_area = (
        f"aggregate({idx}, CAST(0.0 AS DOUBLE), (_ac, _k) -> _ac + "
        f"({clip}[_k].x * {clip}[(_k + 1) % {m1}].y"
        f" - {clip}[(_k + 1) % {m1}].x * {clip}[_k].y))"
    )
    convex_ccw = (
        f"({m} >= 3 AND forall({idx}, _k -> {cross} >= 0)"
        f" AND {signed_area} > 0)"
    )
    # assert_true returns NULL when the predicate holds and raises
    # otherwise, so the CASE always selects the untouched ring.
    return (
        f"CASE WHEN {clip} IS NULL THEN NULL "
        f"WHEN assert_true({convex_ccw}, "
        f"'clip ring must be a convex CCW ring of >= 3 vertices "
        f"with nonzero area (Sutherland-Hodgman precondition; "
        f"triangulate concave clips)') "
        f"IS NULL THEN {clip} END"
    )


def clip_convex_sql(subj: str, clip: str) -> str:
    """Sutherland–Hodgman: ``subj`` (any simple ring) clipped by
    convex CCW ring ``clip``; returns the intersection ring (possibly
    empty). A fold over the clip edges; each step re-emits the subject
    ring cut to one half-plane:

      for each directed subject edge cur->nxt against clip edge a->b:
        crossing (signs of the a->b side-tests differ)  -> emit the
        intersection point; then nxt if it is inside.

    The intersection point is computed unconditionally and discarded
    when not crossing (its 0/0 = NaN on parallel-on-line edges never
    survives the filter). Both operands should be simple column
    references — pre-project computed rings to columns first (see
    let_sql for why).
    """
    m = f"size({clip})"
    a = f"{clip}[_j]"
    b = f"{clip}[(_j + 1) % {m}]"
    # side(p) = cross(b - a, p - a); >= 0 is inside for a CCW clip ring
    def side(p: str) -> str:
        return (
            f"(({b}.x - {a}.x) * ({p}.y - {a}.y)"
            f" - ({b}.y - {a}.y) * ({p}.x - {a}.x))"
        )

    cur = "_P[_i]"
    nxt = "_P[(_i + 1) % size(_P)]"
    d_cur, d_nxt = side(cur), side(nxt)
    # try_divide: ANSI mode is ON, and parallel-on-line edges hit 0/0
    # here; the NULL-vertex result only arises when not crossing, so
    # the filter below always discards it
    t = f"try_divide({d_cur}, {d_cur} - {d_nxt})"
    inter = (
        f"named_struct("
        f"'x', {cur}.x + {t} * ({nxt}.x - {cur}.x), "
        f"'y', {cur}.y + {t} * ({nxt}.y - {cur}.y))"
    )
    crossing = f"(({d_cur} >= 0) != ({d_nxt} >= 0))"
    edge_out = (
        f"concat("
        f"filter(array({inter}), _e -> {crossing}), "
        f"filter(array({nxt}), _e -> {d_nxt} >= 0))"
    )
    one_edge = (
        f"CASE WHEN size(_P) = 0 THEN _P ELSE "
        f"flatten(transform(sequence(0, size(_P) - 1), _i -> {edge_out})) END"
    )
    return f"aggregate(sequence(0, {m} - 1), {subj}, (_P, _j) -> {one_edge})"


def clip_area_general_sql(subj: str, clip: str) -> str:
    """Intersection AREA of simple subject ring ``subj`` with an
    ARBITRARY simple polygon ring ``clip`` — concave rings included —
    as one pure-Catalyst expression. This closes the general-polygon
    gap vs the reference's `arcpy.analysis.Intersect`
    (`GSheetsETL_Lab2.py:125-133`), which accepts concave layers the
    convex-only Sutherland–Hodgman path rejects via
    `assert_convex_ccw_sql`.

    Method — signed fan decomposition: for any simple ring C with
    vertices v0..v(m-1), the fan triangles T_i = (v0, v_i, v_i+1)
    satisfy  sum_i sign(T_i) * 1_{T_i}(x) = winding_C(x)  for a.e. x
    (winding numbers are additive), and winding is +-1 inside a
    simple ring, 0 outside. Hence

        area(P ∩ C) = | sum_i sign(T_i) * area(P ∩ |T_i|) |

    where |T_i| is the triangle as a convex set. Each term is the
    existing convex machinery: orient the triangle CCW, SH-clip the
    subject against it, shoelace the result. Unlike ear clipping this
    needs NO iterative geometry — it is a fold over m-2 triangles, so
    it stays a per-row JVM expression with no Python and no state,
    and it is orientation-independent (a CW ring flips every term's
    sign; the outer abs() absorbs it). Degenerate (collinear)
    triangles contribute exactly 0 and are skipped.

    Cost is O(m) SH folds per row instead of one — use
    `clip_area_col` when the clip layer is convex by construction.
    Self-intersecting clip rings are out of contract (the identity
    above needs a simple ring).
    """
    v0 = f"{clip}[0]"
    vi = f"{clip}[_ti]"
    vj = f"{clip}[_ti + 1]"
    cr = (
        f"(({vi}.x - {v0}.x) * ({vj}.y - {v0}.y)"
        f" - ({vi}.y - {v0}.y) * ({vj}.x - {v0}.x))"
    )
    tri_ccw = (
        f"CASE WHEN _tcr > 0 THEN array({v0}, {vi}, {vj}) "
        f"ELSE array({v0}, {vj}, {vi}) END"
    )
    term = let_sql(
        tri_ccw,
        "_tri",
        let_sql(
            clip_convex_sql(subj, "_tri"),
            "_CC",
            f"CASE WHEN _tcr > 0 THEN {poly_area_sql('_CC')} "
            f"ELSE -{poly_area_sql('_CC')} END",
        ),
    )
    body = f"CASE WHEN _tcr = 0 THEN CAST(0.0 AS DOUBLE) ELSE {term} END"
    folded = (
        f"CASE WHEN {clip} IS NULL OR size({clip}) < 3 THEN NULL ELSE "
        f"abs(aggregate(sequence(1, size({clip}) - 2), CAST(0.0 AS DOUBLE), "
        f"(_tac, _ti) -> _tac + {let_sql(cr, '_tcr', body)})) END"
    )
    return folded


def clip_area_general_col(subj: str, clip: str, ndigits: int = 8) -> "F.Column":
    """ROUNDed general-polygon intersection area column (see
    clip_area_general_sql). Both operands should be simple column
    references — pre-project computed rings first (let_sql rationale).
    """
    return F.expr(f"round({clip_area_general_sql(subj, clip)}, {ndigits})")


def clip_area_col(
    subj: str, clip: str, ndigits: int = 8, check_convex: bool = True
) -> "F.Column":
    """ROUNDed intersection area of two polygon ring columns — the
    refine step of a polygon overlay (apply after bbox_overlap_join).
    The clipped ring is let-bound so the SH fold runs once, not once
    per shoelace reference. ``check_convex`` (default on) fails loud on
    a concave/CW clip ring instead of returning silently wrong areas;
    pass False only when the clip column is convex by construction
    (e.g. `rect_poly_sql` rectangles) and the per-row scan is measured
    to matter."""
    guarded = let_sql(assert_convex_ccw_sql(clip), "_G", clip_convex_sql(subj, "_G")) \
        if check_convex else clip_convex_sql(subj, clip)
    return F.expr(
        f"round({let_sql(guarded, '_C', poly_area_sql('_C'))}, {ndigits})"
    )


def clip_area_with_holes_sql(subj: str, outer: str, holes: str) -> str:
    """Intersection AREA of simple subject ring ``subj`` with a
    POLYGON-WITH-HOLES clip — outer ring ``outer`` (any simple ring,
    concave included) minus the interior rings in ``holes`` (an
    ``array<array<struct<x,y>>>`` column) — as one pure-Catalyst
    expression. This closes the interior-ring gap vs the reference's
    `arcpy.analysis.Intersect` / Buffer / Erase surface
    (`GSheetsETL_Lab2.py:129-133`, `final_project2.py:226-231`):
    arcpy polygon layers (wetlands with lakes, zones with exclusion
    islands) carry interior rings as first-class geometry.

    Method — winding additivity one level up from the fan
    decomposition: for holes H_k that are simple, pairwise disjoint
    (disjoint interiors; shared boundary points are measure-zero and
    fine), and contained in the closure of outer ring C,

        area(P intersect (C - union H_k))
            = area(P intersect C) - sum_k area(P intersect H_k)

    and each term is the existing orientation-independent
    `clip_area_general_sql` kernel. The hole terms fold over the
    array with a plain `aggregate`, so the whole thing stays a
    per-row JVM expression — no Python, no shuffle; callers pair rows
    with `bbox_overlap_join` exactly as for the single-ring overlay.

    Contract: holes inside outer and pairwise disjoint (the standard
    OGC valid-polygon interior-ring rule); a NULL holes column means
    no holes; an empty array contributes 0. Hole orientation is free
    (each term is abs'd). Degenerate (<3-vertex) or NULL holes
    contribute exactly 0 — a degenerate hole removes no area. NULL
    subject/outer propagates NULL as in the single-ring kernel.
    """
    hole_term = clip_area_general_sql(subj, "_HR")
    holes_sum = (
        f"CASE WHEN {holes} IS NULL THEN CAST(0.0 AS DOUBLE) ELSE "
        f"aggregate({holes}, CAST(0.0 AS DOUBLE), "
        f"(_hac, _HR) -> _hac + CASE WHEN _HR IS NULL OR size(_HR) < 3 "
        f"THEN CAST(0.0 AS DOUBLE) ELSE {hole_term} END) END"
    )
    return f"({clip_area_general_sql(subj, outer)} - {holes_sum})"


def clip_area_with_holes_col(
    subj: str, outer: str, holes: str, ndigits: int = 8
) -> "F.Column":
    """ROUNDed polygon-with-holes intersection area column (see
    clip_area_with_holes_sql). All three operands should be simple
    column references — pre-project computed rings first."""
    return F.expr(f"round({clip_area_with_holes_sql(subj, outer, holes)}, {ndigits})")
