"""Report artifact sinks (reference O17 + O19/O20 parity).

The reference ends its pipeline with two artifacts: a 7-column CSV of
target addresses (`export_target_addresses_report`,
`final_project2.py:244-265`) and a styled PDF map export (`exportMap`,
`final_project2.py:146-168`). The CSV report is reproduced exactly
(same 7 columns) plus a JSON run summary; the PDF map is reproduced
by the dependency-free vector writer in pdf.py — same page artifact,
same renderer styling (red fill / black outline / 50% alpha, O19),
driven by the engine's spatial layers instead of arcpy.mp.

The report is small by construction (it's a human artifact), so
coalesce(1) for a single readable file is correct here — this is NOT
a pattern for data-plane sinks, which stay partitioned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

REPORT_COLUMNS = [
    "FULLADDR",
    "ADDRNUM",
    "UNITID",
    "PREDIR",
    "STREETNAME",
    "STREETSUFF",
    "POSTDIR",
]


def export_spray_report(spark: SparkSession, sf_dir: str, out_dir: str) -> dict:
    """Run the flagship spray-targets query and write the CSV report +
    JSON run summary. Returns the summary dict."""
    _ensure_loaded()
    df = REGISTRY["spray_targets"].fn(spark, sf_dir).select(*REPORT_COLUMNS)
    # two actions (write + count) — persist so the anti-join/contain
    # pipeline runs once, not twice
    df = df.persist()
    try:
        csv_dir = os.path.join(out_dir, "target_addresses_report")
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(csv_dir)
        n = df.count()
    finally:
        df.unpersist()
    summary = {
        "report": "Target_Addresses_Report",
        "n_target_addresses": n,
        "columns": REPORT_COLUMNS,
        "source_sf_dir": sf_dir,
        "csv_dir": csv_dir,
    }
    with open(os.path.join(out_dir, "run_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def export_map_pdf(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    title: str = "WNV Spray Targets",
    max_points: int = 10_000,
) -> str:
    """O20 parity: render the spray map (risk zones + surviving
    addresses) to a real PDF via the dependency-free writer in pdf.py.
    The reference blocks on `input()` for a subtitle
    (`final_project2.py:157`); here the title is a parameter. The
    point layer is capped at ``max_points`` driver-side rows — a map
    is a bounded human artifact, not a data sink."""
    from wnv_etl_lab2_spark.pdf import build_pdf, map_content_stream
    from wnv_etl_lab2_spark.queries import geo

    _ensure_loaded()
    pts_df = REGISTRY["spatial_buffer_erase"].fn(spark, sf_dir).limit(max_points)
    points = [(r["x"], r["y"]) for r in pts_df.collect()]
    zones = [
        (r["xmin"], r["ymin"], r["xmax"], r["ymax"])
        for r in geo.risk_zones(spark, sf_dir).collect()
    ]
    pdf = build_pdf(map_content_stream(points, zones, title))
    with open(out_path, "wb") as f:
        f.write(pdf)
    return out_path
