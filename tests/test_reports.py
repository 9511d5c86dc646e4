"""Report sinks: the reference's end-of-pipeline CSV + summary."""

from __future__ import annotations

import json
import os

from wnv_etl_lab2_spark.reports import REPORT_COLUMNS, export_spray_report


def test_export_spray_report(spark, sf_dir, tmp_path):
    out = str(tmp_path / "report")
    summary = export_spray_report(spark, sf_dir, out)
    assert summary["n_target_addresses"] > 0

    back = spark.read.option("header", True).csv(summary["csv_dir"])
    assert back.columns == REPORT_COLUMNS
    assert back.count() == summary["n_target_addresses"]

    with open(os.path.join(out, "run_summary.json")) as f:
        loaded = json.load(f)
    assert loaded == summary
