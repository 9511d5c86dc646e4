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
