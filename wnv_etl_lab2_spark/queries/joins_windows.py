"""Join + window queries (SURVEY.md §2 M2/M3).

Covers the reference's lookup-enrichment pattern (O4 geocode as a
broadcast join), the §2.2 join surface (inner/semi/anti, multiway),
window functions, sessionization, and the batch analogue of a
streaming tumbling window. Join strategy notes are on each query:
small dims are broadcast (no shuffle on the fact side); fact-fact
joins shuffle on the join key and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions.timeutil import epoch_days, epoch_us
from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table


@register(
    "lookup_enrichment_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def lookup_enrichment_join(spark, sf_dir):
    """O4 as designed in SURVEY.md: per-row enrichment re-expressed as a
    broadcast join against a lookup table (the geocode table stand-in).
    nation/region are broadcast — the customer scan never shuffles; at
    100 TB of facts this is the only sane plan and Catalyst picks it
    from the size stats (hinted here explicitly)."""
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )


@register(
    "multiway_join_topk_revenue",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def multiway_join_topk_revenue(spark, sf_dir):
    """TPC-H Q3-shaped 3-way join + agg + top-k. customer filter is
    pushed to the scan; orders-lineitem is the only fact-fact shuffle;
    the aggregate is partial map-side; top-k is TakeOrdered (no global
    sort)."""
    c = load_table(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).where(
        F.expr("o_orderdate < TIMESTAMP '1995-03-15 00:00:00'")
    )
    li = load_table(spark, "lineitem", sf_dir).where(
        F.expr("l_shipdate > TIMESTAMP '1995-03-15 00:00:00'")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "anti_join_no_premium_order",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def anti_join_no_premium_order(spark, sf_dir):
    """Left-anti equi-join (NOT EXISTS): customers with no premium
    (>300k) order. Also the relational shape of the reference's Erase
    (O13). (Every customer has *some* order in this data, so the
    predicate keeps the result non-degenerate.)"""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "semi_join_open_orders",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
)
def semi_join_open_orders(spark, sf_dir):
    """Left-semi equi-join (EXISTS): customers with an open order."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_acctbal")


@register(
    "outer_join_order_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def outer_join_order_counts(spark, sf_dir):
    """Left-outer join preserving zero-order customers (COUNT of a
    nullable column skips nulls on both engines)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rk
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey ASC
               ) AS rk
        FROM part
    )
    WHERE rk <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    """Top-k per group via ranking window; Spark pushes a per-partition
    rank limit (WindowGroupLimit) before the shuffle, so the full sort
    never materializes at scale."""
    p = load_table(spark, "part", sf_dir)
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
    return (
        p.select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 3)
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend,
           LAG(o_orderkey) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
           ) AS prev_orderkey
    FROM orders
    WHERE o_custkey % 50 = 0
    """,
)
def window_running_sum(spark, sf_dir):
    """Running aggregate + LAG over an explicit ROWS frame. The frame
    sum is order-dependent, so the ORDER BY carries a unique tie-break
    (o_orderkey) to make it deterministic across engines."""
    o = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") % 50 == 0)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias(
            "running_spend"
        ),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) / 86400 AS BIGINT)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS orders_last_30d,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) / 86400 AS BIGINT)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ), 2) AS spend_last_30d
    FROM orders
    WHERE o_custkey % 100 = 0
    """,
)
def window_range_frame(spark, sf_dir):
    """Value-based (RANGE) window frame: per customer, rolling 30-day
    order count and spend. Unlike ROWS frames, RANGE bounds are in the
    ORDER-BY value's units — here epoch days — so same-day orders share
    a frame and the result is order-insensitive (no tie-break needed)."""
    o = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") % 100 == 0)
    w = W.partitionBy("o_custkey").orderBy(epoch_days(F.col("o_orderdate"))).rangeBetween(-30, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_last_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_last_30d"),
    )


@register(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(1 + SUM(new_session) AS BIGINT) AS n_sessions
    FROM gaps
    GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir):
    """Sessionization: lag-gap > 30 min starts a new session; counts
    sessions per user. One shuffle on user_id shared by the window and
    the aggregate (Catalyst reuses the partitioning). Timestamps are
    compared as epoch *microsecond integers* — exact on both engines
    (double casts of timestamps round differently)."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    micros = epoch_us(F.col("ts"))
    gaps = ev.select(
        "user_id",
        F.when(micros - F.lag(micros).over(w) > 1800000000, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.lit(1) + F.sum("new_session")).cast("long").alias("n_sessions"),
    )


@register(
    "tumbling_window_batch",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type
    """,
)
def tumbling_window_batch(spark, sf_dir):
    """Batch analogue of the streaming tumbling-window aggregation
    (wnv_etl_lab2_spark.streaming uses the same logical plan over
    readStream + watermark). Bucketing is date_trunc so the group key
    matches the oracle exactly."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "window_rank_variants",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume_d,
           DENSE_RANK() OVER w AS drank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_variants(spark, sf_dir):
    """The remaining ranking-window family in one query: NTILE /
    PERCENT_RANK / CUME_DIST / DENSE_RANK over a per-segment balance
    ordering. The order key carries c_custkey as a tiebreak because
    NTILE (unlike the rank functions) assigns tied rows by physical
    position — without it the quartile of tied balances is
    shuffle-order-dependent. One exchange on the partition key, single
    pass per partition."""
    c = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_d"),
        F.dense_rank().over(w).alias("drank"),
    )
