"""TPC-H gap-fill shapes: the analytic-join patterns not yet covered
by the relational/advanced/sql_api modules — Q6 (scan-only predicate
aggregate), Q7 (bidirectional two-nation volume), Q8 (market share
ratio-of-conditional), Q10 (returned-item customer ranking), and a
Q19-shaped disjunctive join predicate. Together with the existing
Q1/Q2/Q3/Q4/Q5/Q12/Q13/Q14/Q15/Q17/Q18/Q21/Q22 shapes this closes
every TPC-H pattern expressible over the test schema (Q9/Q11/Q16/Q20
need the partsupp table, which the datagen does not produce).

The reference (mberna113/WNV-ETL-Lab2) has no analytic queries at all
— its only aggregate is GetCount (`final_project2.py`); this module
is part of the §2.2 "standard categories with NO reference
implementation" surface that a real engine must carry.

Scale notes per query in the docstrings; all five stay fully inside
whole-stage codegen — no UDFs, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table

def _rev():
    # built lazily: F.col needs an active SparkContext in classic mode
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "forecast_revenue_change",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-side predicate aggregate — the
    canonical pushdown benchmark. All three predicates and both
    referenced columns reach the parquet reader (PushedFilters +
    6-column ReadSchema), so at 100 TB this is a single map-side pass
    with a one-row exchange; no shuffle of data ever happens."""
    li = load_table(spark, "lineitem", sf_dir).where(
        F.expr(
            "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        )
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "nation_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
          OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
        AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) t
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def nation_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional two-nation trade volume by year.
    Both nation sides broadcast (25 rows each) and their name filters
    apply DURING the broadcast probes, so lineitem→orders→customer is
    the only shuffled path; the disjunctive nation-pair predicate
    runs on broadcast-joined columns, never as a cartesian. Year
    extraction is cast to int on both engines so the schemas agree."""
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).where(
        F.expr(
            "l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
        )
    )
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "nation_market_share",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share,
           COUNT(*) AS n_lines
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) t
    GROUP BY o_year
    """,
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's import volume
    for one part type, by year — the ratio-of-conditional-aggregate
    pattern over an 8-way join. part/supplier/nation/region all
    broadcast; the p_type filter prunes part BEFORE the broadcast so
    the probe side only passes matching partkeys. One fact shuffle
    (lineitem↔orders), one low-cardinality final aggregate."""
    p = load_table(spark, "part", sf_dir).where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        F.expr(
            "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
        )
    )
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_regionkey").alias("_cn_region")
    )
    r = load_table(spark, "region", sf_dir).where(F.col("r_name") == "AMERICA")
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("nation")
    )
    vol = _rev()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_cn_key"))
        .join(F.broadcast(r), F.col("_cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "returned_item_ranking",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c_acctbal, 2) AS acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_ranking(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned
    items in one quarter. The l_returnflag + date filters push into
    the scans; nation broadcasts; the final ORDER BY ... LIMIT 20 is
    a TakeOrderedAndProject (per-partition heap + driver merge of 20
    rows — no global sort at any scale). Tie-break on c_custkey makes
    the limit deterministic across engines."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        F.expr(
            "o_orderdate >= TIMESTAMP '1995-10-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"
        )
    )
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_predicate_revenue(spark, sf_dir):
    """TPC-H Q19 shape (adapted to the slim part schema — no
    p_container/l_shipmode in the datagen): an OR-of-ANDs predicate
    spanning both join sides. Catalyst extracts the common join key
    (p_partkey = l_partkey) so this plans as a hash join with a
    residual disjunction, NOT a nested loop; the per-side halves of
    each conjunct (p_brand/p_size on part, l_quantity on lineitem)
    are additionally pushed below the join as an OR-filter on each
    scan, shrinking both inputs before the probe."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(cond).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
