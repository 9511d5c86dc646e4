"""Spatial operators, expressed as Catalyst-optimizable relational plans.

Reference parity (SURVEY.md §2):

- Buffer + Erase (reference `GSheetsETL_Lab2.py:129-133`): "remove
  everything within 1500 ft of an opt-out point" is, on point data,
  exactly a *within-distance anti-join* — point P survives iff no
  opt-out point lies within radius r. We never materialize buffer
  polygons; the distance predicate gives the identical answer.
- SpatialJoin KEEP_COMMON + Join_Count (reference
  `final_project2.py:226-238`): an inner containment join of points
  against zone boxes plus a per-point match count.

Scale design (the part the reference, and naive SQL, get wrong):
a distance join is O(n*m) as a cross join. We bucket both sides onto a
grid of cell size = radius, explode the smaller side into its 3x3
neighbor cells, and equi-join on cell id. Catalyst then plans a plain
shuffle/broadcast hash join on (cx, cy); the exact distance predicate
runs only within candidate cells. At 100 TB this is shuffle-bound on
the grid key (saltable if one cell is hot), never quadratic. The same
pattern generalizes to polygon joins by indexing bounding boxes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_crs(df: DataFrame, crs: str, cols: tuple[str, ...] = ("x", "y")) -> DataFrame:
    """CRS assignment as column metadata (reference O18:
    `arcpy.management.DefineProjection(fc, SpatialReference(2876))`,
    `final_project2.py:170-180`). A metadata-only operation — no row
    transform, travels with the schema through writes."""
    out = df
    for c in cols:
        out = out.withMetadata(c, {"crs": crs})
    return out


def crs_of(df: DataFrame, col: str) -> str | None:
    md = df.schema[col].metadata
    return md.get("crs") if md else None


def _gridded(df: DataFrame, x: str, y: str, cell: float, explode_neighbors: bool) -> DataFrame:
    """Attach integer grid-cell coordinates (cx, cy) at resolution
    ``cell``. With ``explode_neighbors`` each row is emitted into its
    3x3 cell neighborhood, so a cell-equi-join finds every pair within
    ``cell`` distance (candidate superset; exact check follows)."""
    cx = F.floor(F.col(x) / F.lit(cell))
    cy = F.floor(F.col(y) / F.lit(cell))
    if not explode_neighbors:
        return df.withColumn("_cx", cx).withColumn("_cy", cy)
    offsets = F.expr("explode(sequence(-1, 1))")
    return (
        df.withColumn("_bx", cx)
        .withColumn("_by", cy)
        .withColumn("_dx", offsets)
        .withColumn("_dy", F.expr("explode(sequence(-1, 1))"))
        .withColumn("_cx", F.col("_bx") + F.col("_dx"))
        .withColumn("_cy", F.col("_by") + F.col("_dy"))
        .drop("_bx", "_by", "_dx", "_dy")
    )


def _distance_join(
    points: DataFrame,
    avoid: DataFrame,
    radius: float,
    how: str,
    x: str = "x",
    y: str = "y",
    avoid_x: str = "x",
    avoid_y: str = "y",
) -> DataFrame:
    """Grid-bucketed distance semi/anti join: points joined to the
    3x3-neighbor-exploded avoid cells with the EXACT distance
    predicate inside the join condition. A semi/anti join with a join
    filter short-circuits per left row — the first in-cell avoid
    point within radius settles the verdict — where the former
    inner-join + distinct + join-back form ENUMERATED every in-cell
    pair first (quadratic in cell density; the scale smoke measured
    9x wall at a 16x coincident-point pileup). Avoid coordinates are
    also distinct-ed first — duplicate avoid points cannot change any
    verdict, so a pileup of identical opt-outs collapses before the
    join (same exact-dedup-first defense as the text/embedding LSH
    paths). One join, no distinct on matches, no join-back."""
    p = _gridded(points, x, y, radius, explode_neighbors=False)
    a = _gridded(
        avoid.select(
            F.col(avoid_x).alias("_ax"), F.col(avoid_y).alias("_ay")
        ).distinct(),
        "_ax",
        "_ay",
        radius,
        explode_neighbors=True,
    )
    # Written as explicit products (not pow) so the IEEE evaluation is
    # bit-identical to the SQL oracle's `dx*dx + dy*dy` form.
    dx = F.col(x) - F.col("_ax")
    dy = F.col(y) - F.col("_ay")
    d2 = dx * dx + dy * dy
    cond = (
        (p["_cx"] == a["_cx"])
        & (p["_cy"] == a["_cy"])
        & (d2 <= F.lit(radius) * F.lit(radius))
    )
    return p.join(a, cond, how).drop("_cx", "_cy")


def within_distance_anti_join(
    points: DataFrame,
    avoid: DataFrame,
    radius: float,
    point_key: str,
    **kw,
) -> DataFrame:
    """Keep points farther than ``radius`` from EVERY avoid point.

    Semantics of the reference's Buffer(1500ft) + Erase chain
    (`GSheetsETL_Lab2.py:129-133`) on point inputs.

    .. deprecated:: round 6
        ``point_key`` is ignored (retained for call-site stability
        only) — the verdict is ROW-level: each point row is kept or
        dropped by its own coordinates. The pre-round-5 form applied
        a KEY-level verdict (all rows sharing a matched key dropped);
        callers that feed duplicate keys with differing coordinates
        and want key-level semantics must aggregate to one row per
        key first.
    """
    return _distance_join(points, avoid, radius, "left_anti", **kw)


def within_distance_semi_join(
    points: DataFrame,
    avoid: DataFrame,
    radius: float,
    point_key: str,
    **kw,
) -> DataFrame:
    """Keep points within ``radius`` of at least one avoid point
    (the complementary semi-join; the reference's implicit 'inside the
    buffer' set)."""
    return _distance_join(points, avoid, radius, "left_semi", **kw)


def bbox_containment_join(
    points: DataFrame,
    zones: DataFrame,
    x: str = "x",
    y: str = "y",
    how: str = "inner",
) -> DataFrame:
    """Spatial inner join: point-in-box containment (reference
    `arcpy.analysis.SpatialJoin(..., KEEP_COMMON)` at
    `final_project2.py:226-231`).

    Zone tables are small dimensions (risk polygons), so we broadcast
    them and let the containment predicate run inside codegen — no
    shuffle at all on the fact side. For a large zone table the grid
    pattern from `_gridded` applies to boxes (index each box into the
    cells it overlaps).
    """
    pred = (
        (F.col(x) >= zones["xmin"])
        & (F.col(x) <= zones["xmax"])
        & (F.col(y) >= zones["ymin"])
        & (F.col(y) <= zones["ymax"])
    )
    return points.join(F.broadcast(zones), pred, how)


def bbox_overlap_join(
    left: DataFrame,
    right: DataFrame,
    cell: float,
    left_box: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    right_box: tuple[str, str, str, str] = ("pxmin", "pymin", "pxmax", "pymax"),
) -> DataFrame:
    """Zone-zone overlay join: every (left, right) box pair with a
    positive-area intersection (the general form of the reference's
    `arcpy.analysis.Intersect` overlay, `GSheetsETL_Lab2.py:125` /
    `final_project2.py:226` — on axis-aligned boxes the intersection
    geometry is plain interval arithmetic).

    Scale design: both sides may be large, so neither is broadcast.
    Each box is indexed into every grid cell its extent covers
    (``sequence(floor(min/cell), floor(max/cell))`` per axis), the join
    is a plain equi-join on the cell id, and the exact interval-overlap
    predicate runs within cells. A pair whose boxes share several cells
    would duplicate, so each pair is emitted only from the cell that
    contains the intersection's min corner (the standard reference-point
    dedup — no distinct/shuffle needed). At 100 TB this is shuffle-bound
    on the grid key, never quadratic; hot cells salt like any join key.

    Box columns must be disjointly named across the two inputs (alias
    before calling); ``cell`` should be on the order of the larger
    typical box edge so per-box cell fan-out stays O(1).
    """
    lx0, ly0, lx1, ly1 = left_box
    rx0, ry0, rx1, ry1 = right_box

    def covered(df: DataFrame, x0: str, y0: str, x1: str, y1: str, cx: str, cy: str) -> DataFrame:
        return df.withColumn(
            cx, F.explode(F.sequence(F.floor(F.col(x0) / cell), F.floor(F.col(x1) / cell)))
        ).withColumn(
            cy, F.explode(F.sequence(F.floor(F.col(y0) / cell), F.floor(F.col(y1) / cell)))
        )

    l = covered(left, lx0, ly0, lx1, ly1, "_cx", "_cy")
    r = covered(right, rx0, ry0, rx1, ry1, "_rcx", "_rcy")
    overlap = (
        (F.col(lx0) < F.col(rx1))
        & (F.col(rx0) < F.col(lx1))
        & (F.col(ly0) < F.col(ry1))
        & (F.col(ry0) < F.col(ly1))
    )
    ref_point = (
        (F.floor(F.greatest(F.col(lx0), F.col(rx0)) / cell) == F.col("_cx"))
        & (F.floor(F.greatest(F.col(ly0), F.col(ry0)) / cell) == F.col("_cy"))
    )
    cond = (F.col("_cx") == F.col("_rcx")) & (F.col("_cy") == F.col("_rcy"))
    return (
        l.join(r, cond, "inner")
        .where(overlap & ref_point)
        .drop("_cx", "_cy", "_rcx", "_rcy")
    )


def with_join_count(
    joined: DataFrame,
    point_key: str,
    point_cols: list[str],
    match_col: str | None = None,
) -> DataFrame:
    """Collapse a containment join to one row per point with
    ``Join_Count`` = number of matching zones (the arcpy SpatialJoin
    output column filtered by the reference's definition query
    `Join_Count = 1`, `final_project2.py:238`).

    For an OUTER containment join pass ``match_col`` (any zone-side
    column): counting it skips the null-extended row, so an unmatched
    point reports Join_Count = 0 like arcpy — a bare count(1) would
    report 1."""
    cnt = F.count(match_col) if match_col else F.count(F.lit(1))
    return joined.groupBy(point_key, *point_cols).agg(cnt.alias("Join_Count"))
