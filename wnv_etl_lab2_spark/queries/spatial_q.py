"""Spatial parity queries (SURVEY.md §2 O12-O17, M2 minimum slice).

The reference's analysis chain — Buffer(1500ft) -> Erase -> SpatialJoin
KEEP_COMMON -> Join_Count=1 filter -> 7-column report
(`GSheetsETL_Lab2.py:123-134`, `final_project2.py:226-265`) — re-
expressed as Catalyst-optimizable plans over the synthetic geometry in
queries/geo.py. The Spark side uses the grid-bucketed operators from
operators/spatial.py (scales linearly, no cross join); the oracle is
the naive NOT EXISTS / theta-join SQL, fine at sf0.01 — same answer,
different plan, which is exactly the point.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.operators.geometry import (
    clip_area_col,
    clip_area_general_col,
    clip_area_with_holes_col,
    rect_poly_sql,
)
from wnv_etl_lab2_spark.operators.spatial import (
    bbox_containment_join,
    bbox_overlap_join,
    with_join_count,
    within_distance_anti_join,
    within_distance_semi_join,
)
from wnv_etl_lab2_spark.queries import geo, register

_GEO_CTES = (
    f"WITH cust_points AS ({geo.CUST_POINTS_CTE}),\n"
    f"opt_pts AS ({geo.SUPP_POINTS_CTE}),\n"
    f"zones AS ({geo.ZONES_CTE})"
)

_DIST2 = "(p.x - a.x) * (p.x - a.x) + (p.y - a.y) * (p.y - a.y)"
_R2 = f"{geo.RADIUS_DEG} * {geo.RADIUS_DEG}"


@register(
    "spatial_buffer_erase",
    oracle=f"""
    {_GEO_CTES}
    SELECT p.addr_id, p.x, p.y
    FROM cust_points p
    WHERE NOT EXISTS (
        SELECT 1 FROM opt_pts a WHERE {_DIST2} <= {_R2}
    )
    """,
)
def spatial_buffer_erase(spark, sf_dir):
    """O12+O13: Buffer 1500 ft + Erase == keep addresses farther than
    the radius from every opt-out point (within-distance anti-join,
    grid-bucketed)."""
    addrs = geo.customer_addresses(spark, sf_dir).select("addr_id", "x", "y")
    optout = geo.opt_out_points(spark, sf_dir)
    return within_distance_anti_join(addrs, optout, geo.RADIUS_DEG, "addr_id")


@register(
    "spatial_within_buffer",
    oracle=f"""
    {_GEO_CTES}
    SELECT p.addr_id, p.x, p.y
    FROM cust_points p
    WHERE EXISTS (
        SELECT 1 FROM opt_pts a WHERE {_DIST2} <= {_R2}
    )
    """,
)
def spatial_within_buffer(spark, sf_dir):
    """The complementary semi-join: addresses inside at least one
    1500 ft opt-out buffer."""
    addrs = geo.customer_addresses(spark, sf_dir).select("addr_id", "x", "y")
    optout = geo.opt_out_points(spark, sf_dir)
    return within_distance_semi_join(addrs, optout, geo.RADIUS_DEG, "addr_id")


@register(
    "spatial_join_count",
    oracle=f"""
    {_GEO_CTES}
    SELECT p.addr_id, COUNT(*) AS Join_Count
    FROM cust_points p
    JOIN zones z
      ON p.x >= z.xmin AND p.x <= z.xmax AND p.y >= z.ymin AND p.y <= z.ymax
    GROUP BY p.addr_id
    """,
)
def spatial_join_count(spark, sf_dir):
    """O15: spatial inner join (KEEP_COMMON) with per-point match count
    — the arcpy SpatialJoin Join_Count column. Zones broadcast; the
    fact side never shuffles for the join."""
    addrs = geo.customer_addresses(spark, sf_dir).select("addr_id", "x", "y")
    zones = geo.risk_zones(spark, sf_dir)
    joined = bbox_containment_join(addrs, zones)
    return with_join_count(joined, "addr_id", []).select("addr_id", "Join_Count")


@register(
    "spatial_zone_rollup",
    oracle=f"""
    {_GEO_CTES}
    SELECT z.zone_id, COUNT(*) AS n_addresses,
           CAST(SUM(p.addr_id) AS BIGINT) AS addr_checksum
    FROM cust_points p
    JOIN zones z
      ON p.x >= z.xmin AND p.x <= z.xmax AND p.y >= z.ymin AND p.y <= z.ymax
    GROUP BY z.zone_id
    """,
)
def spatial_zone_rollup(spark, sf_dir):
    """Aggregate over the spatial join: addresses per risk zone (the
    hypertable-rollup shape: spatial key -> groupBy)."""
    addrs = geo.customer_addresses(spark, sf_dir).select("addr_id", "x", "y")
    zones = geo.risk_zones(spark, sf_dir)
    joined = bbox_containment_join(addrs, zones)
    return joined.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("n_addresses"),
        F.sum("addr_id").alias("addr_checksum"),
    )


@register(
    "zone_overlay",
    oracle=f"""
    WITH zones AS ({geo.ZONES_CTE}),
    parcels AS ({geo.PARCELS_CTE})
    SELECT zone_id, parcel_id, {geo.IX_AREA} AS ix_area
    FROM zones z JOIN parcels p
      ON xmin < pxmax AND pxmin < xmax AND ymin < pymax AND pymin < ymax
    """,
)
def zone_overlay(spark, sf_dir):
    """O14 general form: polygon-polygon overlay (the reference's
    `arcpy.analysis.Intersect` on the High_Risk layer,
    `GSheetsETL_Lab2.py:125`) on axis-aligned boxes — every
    (zone, parcel) pair with positive-area intersection plus the clipped
    area. Grid-bucketed zone-zone equi-join (neither side broadcast),
    reference-point dedup, so the plan survives two large layers."""
    zones = geo.risk_zones(spark, sf_dir)
    parcels = geo.parcel_boxes(spark, sf_dir)
    pairs = bbox_overlap_join(zones, parcels, cell=0.02)
    return pairs.select("zone_id", "parcel_id", F.expr(geo.IX_AREA).alias("ix_area"))


@register(
    "polygon_clip_area",
    oracle=f"""
    WITH zones AS ({geo.ZONES_CTE}),
    parcels AS ({geo.PARCELS_CTE})
    SELECT zone_id, parcel_id,
           ROUND((least(xmax, pxmax) - greatest(xmin, pxmin))
                 * (least(ymax, pymax) - greatest(ymin, pymin)), 8) AS clip_area
    FROM zones z JOIN parcels p
      ON xmin < pxmax AND pxmin < xmax AND ymin < pymax AND pymin < ymax
    """,
)
def polygon_clip_area(spark, sf_dir):
    """True polygon-polygon intersection (the general form the
    reference runs through `arcpy.analysis.Intersect` on polygon risk
    layers, `GSheetsETL_Lab2.py:125`): zone and parcel boxes become
    vertex rings, candidate pairs come from the grid-bucketed
    bbox_overlap_join, and the refine step runs Sutherland-Hodgman
    clipping + shoelace area as pure Catalyst HOF expressions
    (operators/geometry.py) — no Python, no geometry jar. The operator
    accepts ANY simple subject ring and convex clip ring; on this
    corpus the rings are rectangles, which is what makes the exact
    DuckDB oracle expressible as interval arithmetic (the general-
    polygon paths are pinned by tests/test_geometry.py instead)."""
    zones = geo.risk_zones(spark, sf_dir).withColumn(
        "zpoly", F.expr(rect_poly_sql("xmin", "ymin", "xmax", "ymax"))
    )
    parcels = geo.parcel_boxes(spark, sf_dir).withColumn(
        "ppoly", F.expr(rect_poly_sql("pxmin", "pymin", "pxmax", "pymax"))
    )
    pairs = bbox_overlap_join(zones, parcels, cell=0.02)
    return pairs.select(
        "zone_id", "parcel_id", clip_area_col("ppoly", "zpoly").alias("clip_area")
    )


@register(
    "concave_zone_clip",
    # Oracle by rectilinear decomposition: the L-shaped zone is exactly
    # R1 = [xmin,xmax]x[ymin,ym]  ∪  R2 = [xmin,xm]x[ym,ymax] with
    # disjoint interiors, so area(parcel ∩ L) is the sum of two
    # interval products — exact in DuckDB without any geometry code.
    oracle=f"""
    WITH zones AS ({geo.ZONES_CTE}),
    parcels AS ({geo.PARCELS_CTE}),
    z AS (
      SELECT zone_id, xmin, ymin, xmax, ymax,
             (xmin + xmax) / 2 AS xm, (ymin + ymax) / 2 AS ym
      FROM zones
    )
    SELECT zone_id, parcel_id,
           ROUND(
             greatest(0, least(xmax, pxmax) - greatest(xmin, pxmin))
               * greatest(0, least(ym, pymax) - greatest(ymin, pymin))
             + greatest(0, least(xm, pxmax) - greatest(xmin, pxmin))
               * greatest(0, least(ymax, pymax) - greatest(ym, pymin)),
           8) AS clip_area
    FROM z JOIN parcels p
      ON xmin < pxmax AND pxmin < xmax AND ymin < pymax AND pymin < ymax
    """,
)
def concave_zone_clip(spark, sf_dir):
    """CONCAVE polygon overlay — the general form of the reference's
    `arcpy.analysis.Intersect` (`GSheetsETL_Lab2.py:125-133`), which
    accepts arbitrary polygon layers, not just convex ones. Each risk
    zone becomes an L-shaped 6-vertex ring (its bbox minus the
    top-right quadrant — concave at the inner corner); parcels stay
    rectangles. The refine step is the signed-fan-decomposition
    kernel (operators/geometry.clip_area_general_sql): pure Catalyst,
    orientation-independent, valid for any simple clip ring. Pairs
    come from the same grid-bucketed bbox_overlap_join as the convex
    overlay, so the scale shape is unchanged; pairs overlapping only
    the removed quadrant legitimately report area 0."""
    xm, ym = "(xmin + xmax) / 2", "(ymin + ymax) / 2"
    lring = (
        "array("
        "named_struct('x', xmin, 'y', ymin), "
        "named_struct('x', xmax, 'y', ymin), "
        f"named_struct('x', xmax, 'y', {ym}), "
        f"named_struct('x', {xm}, 'y', {ym}), "
        f"named_struct('x', {xm}, 'y', ymax), "
        "named_struct('x', xmin, 'y', ymax))"
    )
    zones = geo.risk_zones(spark, sf_dir).withColumn("zring", F.expr(lring))
    parcels = geo.parcel_boxes(spark, sf_dir).withColumn(
        "pring", F.expr(rect_poly_sql("pxmin", "pymin", "pxmax", "pymax"))
    )
    pairs = bbox_overlap_join(zones, parcels, cell=0.02)
    return pairs.select(
        "zone_id",
        "parcel_id",
        clip_area_general_col("pring", "zring").alias("clip_area"),
    )


# Shared hole-bound fragments for holed_zone_clip: evaluated by
# F.expr on the Spark side and pasted verbatim into the DuckDB oracle,
# so the bounds arithmetic is bit-identical on both engines. Hole 1
# sits in the L-zone's lower-right lobe, hole 2 in its upper-left arm
# — pairwise disjoint, strictly interior (OGC interior-ring contract).
_H1 = {
    "x0": "(xmin + 0.55 * (xmax - xmin))",
    "x1": "(xmin + 0.85 * (xmax - xmin))",
    "y0": "(ymin + 0.05 * (ymax - ymin))",
    "y1": "(ymin + 0.35 * (ymax - ymin))",
}
_H2 = {
    "x0": "(xmin + 0.05 * (xmax - xmin))",
    "x1": "(xmin + 0.35 * (xmax - xmin))",
    "y0": "(ymin + 0.55 * (ymax - ymin))",
    "y1": "(ymin + 0.85 * (ymax - ymin))",
}


def _rect_clip_product(x0: str, y0: str, x1: str, y1: str) -> str:
    """Oracle fragment: area of parcel-box ∩ [x0,x1]x[y0,y1]."""
    return (
        f"greatest(0, least({x1}, pxmax) - greatest({x0}, pxmin))"
        f" * greatest(0, least({y1}, pymax) - greatest({y0}, pymin))"
    )


@register(
    "holed_zone_clip",
    # Oracle by rectilinear decomposition + hole subtraction: the
    # L-shaped outer ring is R1 ∪ R2 with disjoint interiors (as in
    # concave_zone_clip), the two rectangular holes are interior and
    # disjoint, so area(parcel ∩ (L − H1 − H2)) is four interval
    # products — exact in DuckDB without geometry code.
    oracle=f"""
    WITH zones AS ({geo.ZONES_CTE}),
    parcels AS ({geo.PARCELS_CTE}),
    z AS (
      SELECT zone_id, xmin, ymin, xmax, ymax,
             (xmin + xmax) / 2 AS xm, (ymin + ymax) / 2 AS ym
      FROM zones
    )
    SELECT zone_id, parcel_id,
           ROUND(
             {_rect_clip_product('xmin', 'ymin', 'xmax', 'ym')}
             + {_rect_clip_product('xmin', 'ym', 'xm', 'ymax')}
             - {_rect_clip_product(_H1['x0'], _H1['y0'], _H1['x1'], _H1['y1'])}
             - {_rect_clip_product(_H2['x0'], _H2['y0'], _H2['x1'], _H2['y1'])},
           8) AS clip_area
    FROM z JOIN parcels p
      ON xmin < pxmax AND pxmin < xmax AND ymin < pymax AND pymin < ymax
    """,
)
def holed_zone_clip(spark, sf_dir):
    """POLYGON-WITH-HOLES overlay — the interior-ring form of the
    reference's `arcpy.analysis.Intersect` (`GSheetsETL_Lab2.py:125-
    133`): arcpy polygon layers carry interior rings (a wetland with
    lakes, a zone with exclusion islands) and Buffer/Erase/Intersect
    all respect them. Each risk zone becomes the concave L-ring of
    `concave_zone_clip` MINUS two rectangular interior rings (one per
    lobe); parcels stay rectangles. The refine step is
    operators/geometry.clip_area_with_holes_col — winding additivity:
    the outer term minus a per-hole fold of the same signed-fan
    kernel, all one pure-Catalyst per-row expression. Pairs come from
    the same grid-bucketed bbox_overlap_join, so the scale shape is
    unchanged from the single-ring overlays."""
    xm, ym = "(xmin + xmax) / 2", "(ymin + ymax) / 2"
    lring = (
        "array("
        "named_struct('x', xmin, 'y', ymin), "
        "named_struct('x', xmax, 'y', ymin), "
        f"named_struct('x', xmax, 'y', {ym}), "
        f"named_struct('x', {xm}, 'y', {ym}), "
        f"named_struct('x', {xm}, 'y', ymax), "
        "named_struct('x', xmin, 'y', ymax))"
    )
    holes = (
        "array("
        + rect_poly_sql(_H1["x0"], _H1["y0"], _H1["x1"], _H1["y1"])
        + ", "
        + rect_poly_sql(_H2["x0"], _H2["y0"], _H2["x1"], _H2["y1"])
        + ")"
    )
    zones = (
        geo.risk_zones(spark, sf_dir)
        .withColumn("zring", F.expr(lring))
        .withColumn("zholes", F.expr(holes))
    )
    parcels = geo.parcel_boxes(spark, sf_dir).withColumn(
        "pring", F.expr(rect_poly_sql("pxmin", "pymin", "pxmax", "pymax"))
    )
    pairs = bbox_overlap_join(zones, parcels, cell=0.02)
    return pairs.select(
        "zone_id",
        "parcel_id",
        clip_area_with_holes_col("pring", "zring", "zholes").alias("clip_area"),
    )


_REPORT_COLS = list(geo.REPORT_FIELDS)  # the 7 reference report fields


@register(
    "spray_targets",
    oracle=f"""
    {_GEO_CTES},
    safe AS (
        SELECT * FROM cust_points p
        WHERE NOT EXISTS (
            SELECT 1 FROM opt_pts a WHERE {_DIST2} <= {_R2}
        )
    ),
    counted AS (
        SELECT p.*, z.zone_id
        FROM safe p
        JOIN zones z
          ON p.x >= z.xmin AND p.x <= z.xmax AND p.y >= z.ymin AND p.y <= z.ymax
    )
    SELECT addr_id, {', '.join(_REPORT_COLS)}, COUNT(*) AS Join_Count
    FROM counted
    GROUP BY addr_id, {', '.join(_REPORT_COLS)}
    HAVING COUNT(*) = 1
    """,
)
def spray_targets(spark, sf_dir):
    """FLAGSHIP — the reference's full question, 'which addresses do we
    spray?' (SURVEY.md §7 minimum slice): city addresses -> erase all
    within 1500 ft of an opt-out point (O12+O13, grid-bucketed anti-
    join) -> inner containment join vs risk zones (O14/O15, broadcast)
    -> Join_Count = 1 definition query (O16) -> the 7-field report
    projection (O17, `final_project2.py:252`)."""
    addrs = geo.customer_addresses(spark, sf_dir)
    optout = geo.opt_out_points(spark, sf_dir)
    zones = geo.risk_zones(spark, sf_dir)

    safe = within_distance_anti_join(addrs, optout, geo.RADIUS_DEG, "addr_id")
    joined = bbox_containment_join(safe, zones)
    counted = with_join_count(joined, "addr_id", _REPORT_COLS)
    return counted.where(F.col("Join_Count") == 1).select(
        "addr_id", *_REPORT_COLS, "Join_Count"
    )
