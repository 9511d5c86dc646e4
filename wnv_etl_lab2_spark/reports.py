"""Report artifact sinks (reference O17 + O20 parity).

The reference ends its pipeline with two artifacts: a 7-column CSV of
target addresses (`export_target_addresses_report`,
`final_project2.py:244-265`) and a PDF map export (`exportMap`,
`final_project2.py:146-168`). The CSV report is reproduced exactly
(same 7 columns); the presentation-layer map becomes a JSON run
summary — the engine's scope ends at data artifacts (SURVEY.md O19/
O20: rendering is out of engine scope).

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
