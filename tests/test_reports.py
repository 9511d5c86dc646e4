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


def test_map_pdf_is_structurally_valid(spark, sf_dir, tmp_path):
    """The PDF map export must be a structurally sound PDF: header,
    trailer, and an xref table whose byte offsets land exactly on each
    object — plus the O19 styling and one rectangle per risk zone."""
    import re

    from wnv_etl_lab2_spark.queries import geo
    from wnv_etl_lab2_spark.reports import export_map_pdf

    path = export_map_pdf(spark, sf_dir, str(tmp_path / "map.pdf"), title="Round (2)")
    raw = open(path, "rb").read()
    assert raw.startswith(b"%PDF-1.4") and raw.rstrip().endswith(b"%%EOF")
    # xref offsets must point at the exact start of each object
    offsets = [int(m) for m in re.findall(rb"\n(\d{10}) 00000 n", raw)]
    for i, off in enumerate(offsets, start=1):
        assert raw[off : off + len(f"{i} 0 obj")] == f"{i} 0 obj".encode()
    # startxref points at the xref table
    startxref = int(re.search(rb"startxref\n(\d+)\n%%EOF", raw).group(1))
    assert raw[startxref : startxref + 4] == b"xref"
    # renderer parity: 50% alpha ExtGState + red fill + black stroke
    assert b"/ca 0.5" in raw
    assert b"1 0 0 rg 0 0 0 RG" in raw
    # one styled rectangle per risk zone, title escaped
    n_zones = geo.risk_zones(spark, sf_dir).count()
    assert raw.count(b"re B Q") == n_zones
    assert rb"(Round \(2\))" in raw
