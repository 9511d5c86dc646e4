"""Queries declared through the spark.sql surface (SURVEY.md §3: the
second entry point Catalyst gives for free). Same registry contract —
these prove the SQL front-end handles subqueries Spark's DataFrame
API has no direct verb for (scalar subqueries, correlated EXISTS with
extra predicates), and the ranking-function families."""

from __future__ import annotations

from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table


def _sql(spark, sf_dir, tables, sql):
    for t in tables:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    return spark.sql(sql)


_SCALAR_SUBQ = """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
"""


@register("scalar_subquery", oracle=_SCALAR_SUBQ)
def scalar_subquery(spark, sf_dir):
    """Scalar subquery in a predicate: planned as a one-row broadcast
    against the scan (identical SQL text runs on both engines)."""
    return _sql(spark, sf_dir, ["orders"], _SCALAR_SUBQ)


_CORR_EXISTS = """
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE c_acctbal > 8000 AND EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > c.c_acctbal * 10
    )
"""


@register("correlated_exists", oracle=_CORR_EXISTS)
def correlated_exists(spark, sf_dir):
    """Correlated EXISTS with a non-equi inner predicate — decorrelated
    by Catalyst into a semi-join with the extra condition attached."""
    return _sql(spark, sf_dir, ["customer", "orders"], _CORR_EXISTS)


_MISC_AGG = """
    SELECT o_orderstatus,
           BOOL_AND(o_totalprice > 1050) AS all_above_floor,
           BOOL_OR(o_totalprice > 499900) AS any_near_max,
           CAST(SUM(DISTINCT o_custkey) AS BIGINT) AS custkey_checksum,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           COUNT(*) AS n_total
    FROM orders
    GROUP BY o_orderstatus
"""


@register("misc_agg_filter_bool", oracle=_MISC_AGG)
def misc_agg_filter_bool(spark, sf_dir):
    """Aggregate odds and ends: boolean aggregates, SUM(DISTINCT),
    and the FILTER clause — identical SQL text on both engines. The
    boolean thresholds sit INSIDE the observed o_totalprice range
    (group minima ~1014-2805, maxima ~498k-500k) so the aggregates
    vary by group and a miscomputed bool_and/bool_or fails the gate."""
    return _sql(spark, sf_dir, ["orders"], _MISC_AGG)


_INTERSECT_ALL = """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nk FROM supplier
"""


@register("intersect_all_multiset", oracle=_INTERSECT_ALL)
def intersect_all_multiset(spark, sf_dir):
    """INTERSECT ALL: multiset semantics — each nation key survives
    min(count_left, count_right) times."""
    return _sql(spark, sf_dir, ["customer", "supplier"], _INTERSECT_ALL)


_EXCEPT_ALL = """
    SELECT c_nationkey AS nk FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nk FROM supplier
"""


@register("except_all_multiset", oracle=_EXCEPT_ALL)
def except_all_multiset(spark, sf_dir):
    """EXCEPT ALL: multiset difference — max(count_left - count_right,
    0) copies of each key survive."""
    return _sql(spark, sf_dir, ["customer", "supplier"], _EXCEPT_ALL)


_GROUPING_SETS = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("grouping_sets_agg", oracle=_GROUPING_SETS)
def grouping_sets_agg(spark, sf_dir):
    """Explicit GROUPING SETS with GROUPING() markers (disambiguates
    'NULL key' from 'aggregated-out key' — rollup/cube's general
    form). Identical SQL text runs on both engines."""
    return _sql(spark, sf_dir, ["orders"], _GROUPING_SETS)


_WINDOW_NAV = """
    SELECT o_custkey, o_orderkey,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS dr,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_key
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


@register("window_navigation", oracle=_WINDOW_NAV)
def window_navigation(spark, sf_dir):
    """Ranking/navigation window family: dense_rank, ntile,
    percent_rank, first/last value — deterministic via the unique
    tie-break in every ORDER BY."""
    return _sql(spark, sf_dir, ["orders"], _WINDOW_NAV)


_TOP_SUPPLIER = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("top_supplier_revenue", oracle=_TOP_SUPPLIER)
def top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape: a view-over-aggregate (quarterly revenue per
    supplier) filtered by a scalar subquery over ITSELF (the max).
    Catalyst plans the CTE once per consumer; the max side reduces to
    a one-row broadcast. The date window prunes the scan via pushed
    timestamp filters."""
    return _sql(spark, sf_dir, ["lineitem", "supplier"], _TOP_SUPPLIER)


_SMALL_QTY = """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#12'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
"""


@register("small_qty_part_revenue", oracle=_SMALL_QTY)
def small_qty_part_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar aggregate in the predicate
    (rows below 20% of their part's average quantity). Catalyst
    decorrelates into an aggregate-then-join on l_partkey — one extra
    pass over the (brand-filtered, broadcast-joined) lineitem slice,
    never a per-row subquery execution."""
    return _sql(spark, sf_dir, ["lineitem", "part"], _SMALL_QTY)


_LARGE_ORDERS = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 2) AS total_price,
           ROUND(SUM(l_quantity), 2) AS order_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 350
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


@register("large_volume_orders", oracle=_LARGE_ORDERS)
def large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN over a HAVING'd aggregate (orders whose
    total quantity clears a floor), re-joined to customer and
    re-aggregated. The IN subquery plans as a semi-join against the
    pre-aggregated keys — the lineitem scan happens twice but both
    aggregations are partial before their single shuffle."""
    return _sql(spark, sf_dir, ["customer", "orders", "lineitem"], _LARGE_ORDERS)


_LATE_SHIPPER = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
"""


@register("late_shipper_chain", oracle=_LATE_SHIPPER)
def late_shipper_chain(spark, sf_dir):
    """TPC-H Q21 shape (over l_shipdate — this corpus has no
    commit/receipt dates): the EXISTS / NOT EXISTS chain finding the
    supplier who shipped LAST on a multi-supplier order that shipped
    60+ days late. Catalyst turns the chain into a semi-join plus an
    anti-join on l_orderkey — two shuffles of the (pruned) lineitem
    key columns, no nested-loop re-execution per outer row."""
    return _sql(spark, sf_dir, ["supplier", "lineitem", "orders"], _LATE_SHIPPER)
