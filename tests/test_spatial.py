"""Spatial operators vs a brute-force Python reference on tiny known
inputs — independent of the synthetic-geometry oracle queries."""

from __future__ import annotations

from wnv_etl_lab2_spark.operators.spatial import (
    bbox_containment_join,
    crs_of,
    with_crs,
    with_join_count,
    within_distance_anti_join,
    within_distance_semi_join,
)

POINTS = [  # (id, x, y)
    (1, 0.0, 0.0),
    (2, 1.0, 1.0),
    (3, 5.0, 5.0),
    (4, 5.05, 5.0),
    (5, -3.0, 2.0),
]
AVOID = [(100, 0.05, 0.0), (101, 5.0, 5.04)]  # (id, x, y)
R = 0.1


def brute_force_within(points, avoid, r):
    out = set()
    for pid, px, py in points:
        for _, ax, ay in avoid:
            if (px - ax) ** 2 + (py - ay) ** 2 <= r * r:
                out.add(pid)
    return out


def test_within_distance_joins_match_brute_force(spark):
    pts = spark.createDataFrame(POINTS, "pid long, x double, y double")
    av = spark.createDataFrame(AVOID, "aid long, x double, y double")
    expected_within = brute_force_within(POINTS, AVOID, R)

    semi = {r.pid for r in within_distance_semi_join(pts, av, R, "pid").collect()}
    anti = {r.pid for r in within_distance_anti_join(pts, av, R, "pid").collect()}
    assert semi == expected_within
    assert anti == {p[0] for p in POINTS} - expected_within


def test_grid_neighbor_cells_catch_boundary_pairs(spark):
    # point and avoid in adjacent grid cells, distance just under R
    pts = spark.createDataFrame([(1, 0.199, 0.0)], "pid long, x double, y double")
    av = spark.createDataFrame([(9, 0.101, 0.0)], "aid long, x double, y double")
    semi = within_distance_semi_join(pts, av, 0.1, "pid").collect()
    assert [r.pid for r in semi] == [1]


def test_crs_metadata_survives_transform_and_write(spark, tmp_path):
    pts = spark.createDataFrame([(1, 0.5, 0.5)], "pid long, x double, y double")
    tagged = with_crs(pts, "EPSG:2876")  # reference SR, final_project2.py:175
    assert crs_of(tagged, "x") == "EPSG:2876"
    filtered = tagged.where("pid > 0")  # metadata-only op: no row transform
    assert crs_of(filtered, "x") == "EPSG:2876"
    out = str(tmp_path / "crs_parquet")
    filtered.write.mode("overwrite").parquet(out)
    assert crs_of(spark.read.parquet(out), "x") == "EPSG:2876"


def test_bbox_containment_and_join_count(spark):
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 1.5, 1.5), (3, 0.9, 0.9)], "pid long, x double, y double"
    )
    zones = spark.createDataFrame(
        [(10, 0.0, 0.0, 1.0, 1.0), (11, 0.8, 0.8, 2.0, 2.0)],
        "zone_id long, xmin double, ymin double, xmax double, ymax double",
    )
    joined = bbox_containment_join(pts, zones)
    counts = {
        r.pid: r.Join_Count for r in with_join_count(joined, "pid", []).collect()
    }
    assert counts == {1: 1, 2: 1, 3: 2}  # p3 sits in the overlap

    # outer join + match_col: unmatched point reports 0 (arcpy parity)
    pts2 = pts.union(spark.createDataFrame([(4, 9.0, 9.0)], pts.schema))
    outer = bbox_containment_join(pts2, zones, how="left")
    counts2 = {
        r.pid: r.Join_Count
        for r in with_join_count(outer, "pid", [], match_col="zone_id").collect()
    }
    assert counts2 == {1: 1, 2: 1, 3: 2, 4: 0}
