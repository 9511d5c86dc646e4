"""Deterministic synthetic geometry over the driver tables.

The reference's spatial layers (opt-out points, city addresses, risk
zones — SURVEY.md §1.1) don't exist in the driver test data, so we
derive them arithmetically from `customer` / `supplier` / `nation`.
Every coordinate is a *shared SQL fragment*: Spark evaluates it with
``F.expr`` and the DuckDB oracle evaluates the identical text, so the
doubles are bit-identical on both sides (pure int modular arithmetic
scaled by a double literal — IEEE evaluation order is the same).

Coordinates sit in the reference's Boulder CO frame (lon ~ -105.3..
-105.2, lat ~ 39.98..40.08, EPSG:4326; FIXTURES.md F4/F5), and the
1500 ft buffer radius (reference `GSheetsETL_Lab2.py:129`) becomes
~0.00457 degrees of latitude (FIXTURES.md F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.sources.catalog import load_table

# 1500 ft in degrees latitude (FIXTURES.md F5: ~0.00457 deg).
RADIUS_DEG = 0.00457

# --- shared SQL fragments (identical text on Spark + DuckDB) -----------
CUST_X = "-105.3 + (c_custkey % 1000) * 1e-4"
CUST_Y = "39.98 + ((c_custkey * 31) % 1000) * 1e-4"
SUPP_X = "-105.3 + ((s_suppkey * 13) % 1000) * 1e-4"
SUPP_Y = "39.98 + ((s_suppkey * 53) % 1000) * 1e-4"
ZONE_XMIN = "-105.3 + ((n_nationkey * 37) % 80) * 125e-5"
ZONE_YMIN = "39.98 + ((n_nationkey * 59) % 80) * 125e-5"
ZONE_XMAX = ZONE_XMIN + " + 0.02"
ZONE_YMAX = ZONE_YMIN + " + 0.02"
PARCEL_XMIN = "-105.3 + ((s_suppkey * 29) % 950) * 1e-4"
PARCEL_YMIN = "39.98 + ((s_suppkey * 71) % 950) * 1e-4"
PARCEL_XMAX = PARCEL_XMIN + " + 0.005"
PARCEL_YMAX = PARCEL_YMIN + " + 0.005"

# Box-intersection area on (zone, parcel) column names — identical text
# on both engines so the doubles match bit-for-bit.
IX_AREA = (
    "(least(xmax, pxmax) - greatest(xmin, pxmin))"
    " * (least(ymax, pymax) - greatest(ymin, pymin))"
)

# The 7 report fields of the reference's Target_Addresses_Report
# (`final_project2.py:252`), derived deterministically from customer.
REPORT_FIELDS = {
    "FULLADDR": "c_name",
    "ADDRNUM": "c_custkey % 9000 + 100",
    "UNITID": "case when c_custkey % 7 = 0 then 'A' else null end",
    "PREDIR": (
        "case c_custkey % 5 when 0 then 'N' when 1 then 'S' "
        "when 2 then 'E' when 3 then 'W' else null end"
    ),
    "STREETNAME": "c_mktsegment",
    "STREETSUFF": "case when c_custkey % 2 = 0 then 'St' else 'Ave' end",
    "POSTDIR": "case when c_custkey % 11 = 0 then 'E' else null end",
}

# Oracle-side CTE bodies (DuckDB), built from the same fragments.
CUST_POINTS_CTE = (
    "SELECT c_custkey AS addr_id, "
    + ", ".join(f"{frag} AS {name}" for name, frag in REPORT_FIELDS.items())
    + f", {CUST_X} AS x, {CUST_Y} AS y FROM customer"
)
SUPP_POINTS_CTE = f"SELECT s_suppkey AS opt_id, {SUPP_X} AS x, {SUPP_Y} AS y FROM supplier"
ZONES_CTE = (
    f"SELECT n_nationkey AS zone_id, {ZONE_XMIN} AS xmin, {ZONE_YMIN} AS ymin, "
    f"{ZONE_XMAX} AS xmax, {ZONE_YMAX} AS ymax FROM nation"
)
PARCELS_CTE = (
    f"SELECT s_suppkey AS parcel_id, {PARCEL_XMIN} AS pxmin, {PARCEL_YMIN} AS pymin, "
    f"{PARCEL_XMAX} AS pxmax, {PARCEL_YMAX} AS pymax FROM supplier"
)


# --- Spark-side builders ----------------------------------------------
def customer_addresses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """City address layer (FIXTURES.md F4 analogue): one point per
    customer with the 7 report fields."""
    cols = [F.col("c_custkey").alias("addr_id")]
    cols += [F.expr(frag).alias(name) for name, frag in REPORT_FIELDS.items()]
    cols += [F.expr(CUST_X).alias("x"), F.expr(CUST_Y).alias("y")]
    return load_table(spark, "customer", sf_dir).select(*cols)


def opt_out_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opt-out point layer (F3 analogue): one point per supplier."""
    return load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("opt_id"),
        F.expr(SUPP_X).alias("x"),
        F.expr(SUPP_Y).alias("y"),
    )


def risk_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-risk zone boxes (F5 analogue): one bbox per nation."""
    return load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("zone_id"),
        F.expr(ZONE_XMIN).alias("xmin"),
        F.expr(ZONE_YMIN).alias("ymin"),
        F.expr(ZONE_XMAX).alias("xmax"),
        F.expr(ZONE_YMAX).alias("ymax"),
    )


def parcel_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parcel box layer (overlay second operand): one 0.005-deg square
    per supplier, columns prefixed ``p*`` so the overlay join and the
    shared ``IX_AREA`` fragment see disjoint names.

    spread_scan: parcels are the PROBE side of every overlay's
    broadcast join, so the per-pair clip kernels (signed-fan /
    winding-additivity HOFs — measured ~0.78 s for 1.3k pairs at
    sf0.1) evaluate inside this scan's stage; a single-row-group file
    serializes all of it on one core. No-op at scale."""
    from wnv_etl_lab2_spark.sources.catalog import spread_scan

    # full_width: supplier is ~22 KB but this scan stage hosts every
    # overlay pair's clip kernel (~0.78 s of CPU at sf0.1) — the
    # byte-derived width (2 tasks) serialized it (r18 bench regression:
    # concave/holed clips +35-60%); spread over all task slots.
    return spread_scan(
        load_table(spark, "supplier", sf_dir), "s_suppkey", full_width=True
    ).select(
        F.col("s_suppkey").alias("parcel_id"),
        F.expr(PARCEL_XMIN).alias("pxmin"),
        F.expr(PARCEL_YMIN).alias("pymin"),
        F.expr(PARCEL_XMAX).alias("pxmax"),
        F.expr(PARCEL_YMAX).alias("pymax"),
    )
