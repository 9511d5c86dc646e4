"""Core relational queries (SURVEY.md §2 M1 + M3).

Covers reference operators O3 (projection + concat), O6 (null filter),
O7 (clean + cast), O8 (constant column), O11 (count), plus the
standard aggregation/grouping surface the reference lacks (§2.2) —
all pure built-in Catalyst expressions: whole-stage codegen, pushdown,
partial (map-side) aggregation for free. Double-valued aggregates are
rounded to 2 decimals on BOTH sides so summation-order noise between
engines can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions.cleaning import clean_cast_double, with_constant, with_full_address
from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: the flagship groupBy/agg.

    Scale: partial aggregation map-side, 6-group output — shuffle
    carries only the per-partition partials regardless of input size.
    """
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(F.expr("l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "projection_concat",
    oracle="""
    SELECT c_custkey AS addr_id, c_name || ' Boulder CO' AS full_addr
    FROM customer
    """,
)
def projection_concat(spark, sf_dir):
    """O3: project one column, append a literal suffix (reference
    `Lab2ETL.py:69` — `row["Street Address"] + " Boulder CO"`).
    Column-pruned at the Parquet scan: only c_custkey/c_name read."""
    cust = load_table(spark, "customer", sf_dir)
    return cust.select(
        F.col("c_custkey").alias("addr_id"),
        with_full_address("c_name").alias("full_addr"),
    )


@register(
    "clean_cast_filter",
    oracle="""
    WITH polluted AS (
        SELECT o_orderkey,
               CASE
                 WHEN o_orderkey % 7 = 0 THEN 'n/a'
                 WHEN o_orderkey % 3 = 0 THEN '"' || CAST(o_orderkey % 500 AS STRING) || '"'
                 WHEN o_orderkey % 3 = 1 THEN ' ' || CAST(o_orderkey % 500 AS STRING) || ' '
                 ELSE CAST(o_orderkey % 500 AS STRING)
               END AS raw_coord
        FROM orders
    )
    SELECT o_orderkey,
           CAST(TRIM(REGEXP_REPLACE(raw_coord, '[''"]', '', 'g')) AS DOUBLE) AS coord
    FROM polluted
    WHERE TRY_CAST(TRIM(REGEXP_REPLACE(raw_coord, '[''"]', '', 'g')) AS DOUBLE) IS NOT NULL
    """,
)
def clean_cast_filter(spark, sf_dir):
    """O7 + O6: strip quotes/whitespace, cast to double, drop rows that
    fail the cast (reference `Lab2ETL.py:76-80` drop-on-ValueError and
    `:74` null filter). The pollution is synthesized deterministically
    from o_orderkey; the cleaning path is the operator under test.
    Cast failure -> NULL -> filter: row-level skip without a Python
    exception handler, fully codegen'd."""
    polluted = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.expr(
            "CASE WHEN o_orderkey % 7 = 0 THEN 'n/a' "
            "WHEN o_orderkey % 3 = 0 THEN '\"' || CAST(o_orderkey % 500 AS STRING) || '\"' "
            "WHEN o_orderkey % 3 = 1 THEN ' ' || CAST(o_orderkey % 500 AS STRING) || ' ' "
            "ELSE CAST(o_orderkey % 500 AS STRING) END"
        ).alias("raw_coord"),
    )
    cleaned = polluted.select("o_orderkey", clean_cast_double("raw_coord").alias("coord"))
    return cleaned.where(F.col("coord").isNotNull())


@register(
    "constant_column",
    oracle="""
    SELECT o_orderkey, 'Residential' AS Type
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def constant_column(spark, sf_dir):
    """O8: constant-column append (reference `Lab2ETL.py:78`,
    Type = 'Residential') after a pushed-down filter."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", with_constant("Residential").alias("Type")
    )


@register("row_count", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def row_count(spark, sf_dir):
    """O11: row count (reference `arcpy.GetCount_management`,
    `Lab2ETL.py:94`). Parquet-metadata-only count in Spark."""
    return load_table(spark, "lineitem", sf_dir).agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "groupby_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price,
           ROUND(AVG(o_totalprice), 2) AS avg_price,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def groupby_agg(spark, sf_dir):
    """Full scalar-aggregate surface: count/sum/avg/min/max per group."""
    return (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "distinct_count",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    """,
)
def distinct_count(spark, sf_dir):
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    return load_table(spark, "orders", sf_dir).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@register(
    "dedup_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem",
)
def dedup_distinct_rows(spark, sf_dir):
    """Exact row-level distinct (hash aggregate on all columns)."""
    return load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_linestatus", "l_linenumber"
    ).distinct()


@register(
    "rollup_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_agg(spark, sf_dir):
    """Hierarchical subtotals (grouping-sets expansion, single shuffle)."""
    return (
        load_table(spark, "orders", sf_dir)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@register(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark, sf_dir):
    """All grouping combinations over two keys."""
    return (
        load_table(spark, "lineitem", sf_dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "scalar_string_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           UPPER(o_orderpriority) AS prio_upper,
           SUBSTR(o_orderstatus, 1, 1) AS status_c,
           LENGTH(o_orderpriority) AS prio_len,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS size_class
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
)
def scalar_string_date_funcs(spark, sf_dir):
    """Scalar function surface: date extraction, string ops, CASE.
    (The reference's only scalars are concat/trim/cast — O3/O7; this is
    the §2.2 built-in extension.) LENGTH cast: DuckDB returns BIGINT,
    Spark INT — pinned to BIGINT on the Spark side."""
    o = load_table(spark, "orders", sf_dir)
    return o.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_class"),
    )


@register(
    "json_extraction",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE event_type = 'click'
    """,
)
def json_extraction(spark, sf_dir):
    """Semi-structured extraction from a JSON string column (the
    reference parses Nominatim JSON driver-side, `Lab2ETL.py:35-38`;
    here it's a codegen'd path expression)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.where(F.col("event_type") == "click").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


@register(
    "variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def variant_extract(spark, sf_dir):
    """Semi-structured VARIANT path (Spark 4): parse_json into a
    variant, typed extraction with variant_get — the open-schema
    column pattern for heterogeneous event payloads (DuckDB mirrors
    with its JSON type)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
    )


@register(
    "union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def union_distinct(spark, sf_dir):
    """Set op: UNION (distinct)."""
    c = (
        load_table(spark, "customer", sf_dir)
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.union(o).distinct()


@register(
    "intersect_keys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def intersect_keys(spark, sf_dir):
    """Set op: INTERSECT."""
    c = (
        load_table(spark, "customer", sf_dir)
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.intersect(o)


@register(
    "except_keys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def except_keys(spark, sf_dir):
    """Set op: EXCEPT — well-funded customers with no premium order."""
    c = (
        load_table(spark, "customer", sf_dir)
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.exceptAll(o).distinct()


@register(
    "orderby_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
)
def orderby_limit_topk(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap then k-way driver merge, no full sort at any scale. Ties
    broken by unique key so the set is deterministic."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(10)
    )


@register(
    "pivot_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_agg(spark, sf_dir):
    """Pivot: wide aggregation with explicit value list (no extra pass
    to discover pivot values)."""
    li = load_table(spark, "lineitem", sf_dir)
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pv


# Column profile spec for `table_profile`: (column, min/max eligible).
# Doubles are profiled for nulls/distinct only — their string
# rendering differs across engines (shortest-roundtrip formats), so
# cross-engine min/max equality cannot be asserted for them, while
# counts are representation-independent.
_PROFILE_COLS = [
    ("l_orderkey", True),
    ("l_partkey", True),
    ("l_suppkey", True),
    ("l_linenumber", True),
    ("l_quantity", False),
    ("l_extendedprice", False),
    ("l_discount", False),
    ("l_tax", False),
    ("l_returnflag", True),
    ("l_linestatus", True),
    ("l_shipdate", True),
]


def _profile_oracle() -> str:
    branches = []
    for col, mm in _PROFILE_COLS:
        mn = f"MIN(CAST({col} AS VARCHAR))" if mm else "CAST(NULL AS VARCHAR)"
        mx = f"MAX(CAST({col} AS VARCHAR))" if mm else "CAST(NULL AS VARCHAR)"
        branches.append(
            f"SELECT '{col}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"CAST(COUNT(DISTINCT CAST({col} AS VARCHAR)) AS BIGINT) AS n_distinct, "
            f"{mn} AS min_val, {mx} AS max_val FROM lineitem"
        )
    return " UNION ALL ".join(branches)


@register("table_profile", oracle=_profile_oracle())
def table_profile(spark, sf_dir):
    """Column-level profile of lineitem — nulls, exact distinct
    cardinality, lexicographic min/max of the string rendering (the
    DESCRIBE-style convention; the reference's observability surface
    O22 logs row counts, this is its per-column generalization).

    ONE scan: every column is unpivoted to (column_name, value-as-
    string, minmax-eligible) rows via stack(), then a single groupBy
    per column computes all four statistics — no per-column scan and
    no multi-distinct expand. At 100 TB the same plan holds (the
    shuffle carries one row per non-null cell, the classic profile
    cost); production profiling would swap COUNT(DISTINCT) for
    approx_count_distinct, which the exact oracle here cannot check —
    exactness is the point of this query."""
    li = load_table(spark, "lineitem", sf_dir)
    stack_args = ", ".join(
        f"'{c}', CAST({c} AS STRING), {'true' if mm else 'false'}"
        for c, mm in _PROFILE_COLS
    )
    ex = li.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column_name, sval, mm)"
        )
    )
    return ex.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("sval").isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
        F.countDistinct("sval").cast("long").alias("n_distinct"),
        F.min(F.when(F.col("mm"), F.col("sval"))).alias("min_val"),
        F.max(F.when(F.col("mm"), F.col("sval"))).alias("max_val"),
    )


@register(
    "data_quality_checks",
    # Constraint-audit surface (dbt tests / expectations): each row is
    # one named check with its population and violation count — the
    # per-table generalization of the reference's row-count logging
    # (O22). Checks are chosen to exercise FK, uniqueness, range, and
    # null-rate shapes.
    oracle="""
    SELECT 'orders_custkey_fk' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'customer_custkey_unique',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'orders_totalprice_nonneg',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'events_value_nonnull',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents_have_embeddings',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN e.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def data_quality_checks(spark, sf_dir):
    """Declarative data-quality audit: named constraint checks (FK
    integrity via LEFT-join null probes, key uniqueness, value range,
    null rate), one row each with population and violation counts —
    the expectations/dbt-test surface an engine needs around its
    pipelines. Every check is a combinable aggregate; the FK probes
    broadcast the dimension side under AQE, and the union branches
    run as independent stages, so the audit costs one scan per
    participating table at any corpus size."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    ev = load_table(spark, "events", sf_dir)

    def check(name, df, viol_col):
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.sum(F.when(viol_col, 1).otherwise(0)).cast("long").alias("n_violations"),
        )

    fk1 = o.join(
        c.select(F.col("c_custkey").alias("_ck")),
        o["o_custkey"] == F.col("_ck"),
        "left",
    )
    fk2 = li.join(
        o.select(F.col("o_orderkey").alias("_ok")),
        li["l_orderkey"] == F.col("_ok"),
        "left",
    )
    uniq = c.agg(
        F.lit("customer_custkey_unique").alias("check_name"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey"))
        .cast("long")
        .alias("n_violations"),
    )
    d = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    fk3 = d.join(
        emb.select(F.col("vec_id").alias("_vk")), d["doc_id"] == F.col("_vk"), "left"
    )
    return (
        check("orders_custkey_fk", fk1, F.col("_ck").isNull())
        .unionByName(check("lineitem_orderkey_fk", fk2, F.col("_ok").isNull()))
        .unionByName(uniq)
        .unionByName(check("orders_totalprice_nonneg", o, F.col("o_totalprice") < 0))
        .unionByName(check("events_value_nonnull", ev, F.col("value").isNull()))
        .unionByName(check("documents_have_embeddings", fk3, F.col("_vk").isNull()))
    )
