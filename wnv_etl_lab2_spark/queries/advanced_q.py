"""Advanced relational coverage: statistical aggregates, the TPC-H
Q5-shaped multiway join, skew-safe salted aggregation, and the
regexp/null-handling scalar surface."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.operators.skew import salted_groupby_agg
from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table


@register(
    "stats_agg",
    oracle="""
    SELECT o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS std_price,
           ROUND(VAR_SAMP(o_totalprice), 2) AS var_price,
           ROUND(CORR(o_totalprice, o_custkey), 6) AS corr_price_cust,
           ROUND(COVAR_SAMP(o_totalprice, o_custkey), 2) AS covar_price_cust
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def stats_agg(spark, sf_dir):
    """Statistical aggregate surface: stddev/variance/corr/covar —
    single-pass, numerically-stable implementations on both engines
    (rounded so last-ulp accumulation order can't flip the hash)."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
        F.round(F.corr("o_totalprice", "o_custkey"), 6).alias("corr_price_cust"),
        F.round(F.covar_samp("o_totalprice", "o_custkey"), 2).alias("covar_price_cust"),
    )


@register(
    "regional_revenue",
    oracle="""
    SELECT r.r_name AS region,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r.r_name
    """,
)
def regional_revenue(spark, sf_dir):
    """TPC-H Q5-shaped 5-way join: two broadcast dims (region, nation),
    one mid-size dim (customer), one fact-fact shuffle
    (orders-lineitem). Catalyst orders the joins from size stats; the
    date filter pushes into the orders scan before anything joins."""
    r = load_table(spark, "region", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        F.expr(
            "o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"
        )
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "salted_groupby",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def salted_groupby(spark, sf_dir):
    """Skew-safe aggregation: partial agg on (key, salt) then merge on
    key (operators/skew.py). The oracle is the PLAIN group-by — the
    salted plan must produce byte-identical results, proving the
    technique is free to apply when a key runs hot at 100 TB."""
    o = load_table(spark, "orders", sf_dir)
    out = salted_groupby_agg(
        o,
        keys=["o_orderpriority"],
        aggs={"n_orders": ("count", "o_orderkey"), "sum_price": ("sum", "o_totalprice")},
        salt_col="o_orderkey",
        buckets=16,
    )
    return out.select(
        "o_orderpriority", "n_orders", F.round("sum_price", 2).alias("sum_price")
    )


@register(
    "argmax_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               MAX(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx,
               MIN(c_custkey) OVER (
                   PARTITION BY c_nationkey, c_acctbal
               ) AS first_key
        FROM customer
    )
    WHERE c_acctbal = mx AND c_custkey = first_key
    """,
)
def argmax_per_group(spark, sf_dir):
    """Argmax per group (TPC-H Q2 shape: the row achieving the group
    max) via window max + equality filter, ties broken by lowest key —
    no self-join against the aggregate."""
    c = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_nationkey")
    wt = W.partitionBy("c_nationkey", "c_acctbal")
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.max("c_acctbal").over(w).alias("mx"),
            F.min("c_custkey").over(wt).alias("first_key"),
        )
        .where((F.col("c_acctbal") == F.col("mx")) & (F.col("c_custkey") == F.col("first_key")))
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "sales_opportunity",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
      AND c.c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
      )
    """,
)
def sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: in-list filter + scalar-average subquery +
    anti-join, composed in the DataFrame API (the scalar subquery is a
    broadcast one-row cross join)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    prem = o.where(F.col("o_totalprice") > 400000)
    return (
        c.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(prem, c.c_custkey == prem.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "nullsafe_join",
    oracle="""
    WITH a AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS seg
        FROM customer WHERE c_custkey % 2 = 0
    ),
    b AS (
        SELECT CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_mktsegment END AS seg,
               COUNT(*) AS seg_n
        FROM customer GROUP BY 1
    )
    SELECT a.c_custkey, a.seg, b.seg_n
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)
def nullsafe_join(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — the corner ordinary equi-joins silently drop."""
    c = load_table(spark, "customer", sf_dir)
    seg = F.when(F.col("c_custkey") % 3 == 0, F.lit(None)).otherwise(F.col("c_mktsegment"))
    a = c.where(F.col("c_custkey") % 2 == 0).select("c_custkey", seg.alias("seg"))
    b = c.select(seg.alias("seg")).groupBy("seg").agg(F.count(F.lit(1)).alias("seg_n"))
    return a.join(b, a["seg"].eqNullSafe(b["seg"])).select(
        a["c_custkey"], a["seg"], b["seg_n"]
    )


@register(
    "order_count_histogram",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    """,
)
def order_count_histogram(spark, sf_dir):
    """TPC-H Q13 shape: double aggregation (orders per customer, then
    the distribution of those counts). Two shuffles, the second one on
    a tiny domain."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
)
def order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: date-windowed orders with a correlated EXISTS
    against lineitem (late-shipping lines), counted by priority. The
    EXISTS becomes a semi-join on the pre-filtered orders side."""
    o = load_table(spark, "orders", sf_dir).where(
        F.expr(
            "o_orderdate >= TIMESTAMP '1995-07-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP '1995-10-01 00:00:00'"
        )
    )
    li = load_table(spark, "lineitem", sf_dir)
    late = o.join(
        li, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "shipping_priority_buckets",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def shipping_priority_buckets(spark, sf_dir):
    """TPC-H Q12 shape: conditional-CASE counting over a fact-fact
    join (priority class buckets per line status)."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).where(
        F.expr(
            "l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"
        )
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct,
           COUNT(*) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: ratio of conditional to total aggregate in one
    pass (promo revenue share for a month)."""
    li = load_table(spark, "lineitem", sf_dir).where(
        F.expr(
            "l_shipdate >= TIMESTAMP '1995-09-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'"
        )
    )
    p = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "collect_sorted_agg",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys_csv,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey % 200 = 0
    GROUP BY o_custkey
    """,
)
def collect_sorted_agg(spark, sf_dir):
    """Deterministic list aggregation: collect_list is order-
    nondeterministic under parallelism, so the engine contract is
    sort_array(collect_list(...)) — rendered to CSV so the oracle
    comparison stays scalar-typed."""
    o = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") % 200 == 0)
    return o.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias("order_keys_csv"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "regexp_null_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS cust_digits,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 2) END AS pos_bal,
           LEAST(c_acctbal, 5000.0) AS capped_bal,
           GREATEST(c_acctbal, 0.0) AS floored_bal
    FROM customer
    WHERE c_custkey % 7 = 0
    """,
)
def regexp_null_funcs(spark, sf_dir):
    """Regexp extraction + NULL-handling scalar surface (coalesce,
    nullif, least/greatest) — all codegen'd expressions."""
    c = load_table(spark, "customer", sf_dir).where(F.col("c_custkey") % 7 == 0)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("cust_digits"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.round("c_acctbal", 2)).alias(
            "pos_bal"
        ),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("capped_bal"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("floored_bal"),
    )


@register(
    "salted_join_agg",
    oracle="""
    SELECT s_name,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
)
def salted_join_agg(spark, sf_dir):
    """Skew-mitigated join (operators/skew.salted_join): lineitem is
    salted on l_orderkey, supplier replicated per salt bucket, join on
    (suppkey, salt) — a hot supplier spreads over 8 partitions. The
    oracle is the PLAIN join: salting must not change a single row."""
    from wnv_etl_lab2_spark.operators.skew import salted_join

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey", "l_orderkey", "l_extendedprice"
    )
    sup = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(li, sup, key="l_suppkey", salt_source_col="l_orderkey", buckets=8)
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@register(
    "customer_rfm_segments",
    # Recency-Frequency-Monetary segmentation: per customer the last
    # order date, order count, and total spend, quartiled per metric
    # with a deterministic custkey tie-break, concatenated into the
    # classic 'RFM' segment code. NTILE ties are broken identically
    # on both engines by the explicit ORDER BY.
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
      FROM rfm
    )
    SELECT CONCAT(CAST(r AS VARCHAR), CAST(f AS VARCHAR), CAST(m AS VARCHAR))
             AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1
    """,
)
def customer_rfm_segments(spark, sf_dir):
    """RFM customer segmentation: quartile scores of recency,
    frequency, and monetary value (deterministic custkey tie-break),
    concatenated into the 64 classic segment codes with customer
    counts. The NTILE windows run over the per-customer aggregate
    (one row per customer — orders of magnitude below the fact
    table); a 100 TB deployment quartiles per region/shard or swaps
    NTILE for approx-quantile cutpoints, the documented trade."""
    from pyspark.sql import Window as W

    o = load_table(spark, "orders", sf_dir)
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    r = F.ntile(4).over(W.orderBy(F.col("last_order").desc(), F.col("o_custkey")))
    f = F.ntile(4).over(W.orderBy(F.col("freq").desc(), F.col("o_custkey")))
    m = F.ntile(4).over(W.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
    scored = rfm.select(
        F.concat(
            r.cast("string"), f.cast("string"), m.cast("string")
        ).alias("segment")
    )
    return scored.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
