"""Temporal joins + extended SQL surface (SURVEY.md §2.2 extensions).

The as-of and range joins are the operators Spark lacks natively
(DuckDB ships ASOF JOIN — which is exactly what the oracle uses, so
the union+window / bucketed re-expressions are verified against the
real thing). The rest widens the checked built-in surface: exact
percentiles, unpivot, array functions, geometry-struct construction
(reference O10), sliding windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions.timeutil import epoch_seconds
from wnv_etl_lab2_spark.operators.asof import asof_join, bucketed_range_join
from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table


@register(
    "asof_join_click_view",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, r.ts AS matched_ts, r.value AS matched_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_click_view(spark, sf_dir):
    """As-of join: every click matched to the user's latest view at or
    before it. Spark has no ASOF JOIN; this is the union+window
    re-expression (one shuffle on user_id, no range explosion) checked
    against DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(clicks, views, by="user_id", value_cols=("value",))
    return out.select("event_id", "user_id", "ts", "matched_ts", "matched_value")


@register(
    "range_join_maintenance",
    oracle="""
    WITH iv AS (
        SELECT s_suppkey AS window_id,
               TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (s_suppkey) HOUR AS t_start,
               TIMESTAMP '2024-01-01 00:30:00' + INTERVAL (s_suppkey) HOUR AS t_end
        FROM supplier
    )
    SELECT e.event_id, iv.window_id, e.ts
    FROM events e JOIN iv
      ON e.ts >= iv.t_start AND e.ts <= iv.t_end
    """,
)
def range_join_maintenance(spark, sf_dir):
    """Interval containment (range) join: events falling inside hourly
    maintenance windows derived from supplier keys. Implemented as the
    bucketed range join (equi-join on the hour bucket + exact filter)
    — the oracle runs the naive theta join."""
    ev = load_table(spark, "events", sf_dir)
    iv = load_table(spark, "supplier", sf_dir).select(
        F.col("s_suppkey").alias("window_id"),
        F.expr(
            "timestampadd(HOUR, cast(s_suppkey AS int), timestamp '2024-01-01 00:00:00')"
        ).alias("t_start"),
        F.expr(
            "timestampadd(HOUR, cast(s_suppkey AS int), timestamp '2024-01-01 00:30:00')"
        ).alias("t_end"),
    )
    joined = bucketed_range_join(ev, iv, bucket_seconds=3600)
    return joined.select("event_id", "window_id", "ts")


@register(
    "percentile_agg",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentile_agg(spark, sf_dir):
    """Exact percentiles (linear interpolation — Spark `percentile`
    and DuckDB `quantile_cont` agree). For 100 TB use
    approx_percentile; the exact form is the correctness anchor."""
    o = load_table(spark, "orders", sf_dir)
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value
    FROM part WHERE p_partkey % 100 = 0
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS metric_value
    FROM part WHERE p_partkey % 100 = 0
    """,
)
def unpivot_part_metrics(spark, sf_dir):
    """Unpivot (wide -> long) via stack — the inverse of pivot_agg."""
    p = load_table(spark, "part", sf_dir).where(F.col("p_partkey") % 100 == 0)
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) "
            "AS (metric, metric_value)"
        ),
    )


@register(
    "array_functions",
    oracle="""
    SELECT p_partkey,
           LEN(string_split(p_name, ' ')) AS n_words,
           array_to_string(list_sort(string_split(p_name, ' ')), '-') AS sorted_words,
           list_contains(string_split(p_name, ' '), 'green') AS has_green
    FROM part WHERE p_partkey % 20 = 0
    """,
)
def array_functions(spark, sf_dir):
    """Array/higher-order scalar surface: split, sort, join, contains
    — all JVM-side expressions (scalar outputs so the oracle compare
    stays type-stable)."""
    p = load_table(spark, "part", sf_dir).where(F.col("p_partkey") % 20 == 0)
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(words).cast("long").alias("n_words"),
        F.array_join(F.sort_array(words), "-").alias("sorted_words"),
        F.array_contains(words, "green").alias("has_green"),
    )


@register(
    "points_from_xy",
    oracle="""
    SELECT c_custkey AS addr_id,
           -105.3 + (c_custkey % 1000) * 1e-4 AS x,
           39.98 + ((c_custkey * 31) % 1000) * 1e-4 AS y
    FROM customer
    """,
)
def points_from_xy(spark, sf_dir):
    """O10: points-from-XY constructor (reference
    `arcpy.management.XYTableToPoint`, `GSheetsETL_Lab2.py:109`) — the
    geometry struct is built then projected back to scalars (struct
    columns don't round-trip through the oracle compare)."""
    from wnv_etl_lab2_spark.queries import geo

    pts = geo.customer_addresses(spark, sf_dir).withColumn(
        "geom", F.struct(F.col("x"), F.col("y"))
    )
    return pts.select(
        "addr_id", F.col("geom.x").alias("x"), F.col("geom.y").alias("y")
    )


@register(
    "sliding_window_batch",
    oracle="""
    SELECT date_trunc('hour', ts) - INTERVAL (k) HOUR AS window_start,
           event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events CROSS JOIN (VALUES (0), (1)) t(k)
    GROUP BY 1, 2
    """,
)
def sliding_window_batch(spark, sf_dir):
    """Sliding window (2h length, 1h slide) as batch: each event lands
    in exactly two windows — explode the window index, then a plain
    groupBy (the streaming twin uses F.window with slideDuration)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.withColumn("k", F.explode(F.array(F.lit(0), F.lit(1))))
        .groupBy(
            F.expr("timestampadd(HOUR, -k, date_trunc('hour', ts))").alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register("approx_distinct_stats")  # HLL internals differ per engine -> rows-only
def approx_distinct_stats(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the 100 TB cardinality-estimation path. Deterministic for fixed
    data but not SQL-oracle-matchable (different sketch internals)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@register(
    "gap_fill_locf",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS day_avg
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id),
    grid AS (
      SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    )
    SELECT g.user_id, g.day,
           d.day_avg IS NULL AS is_gap,
           LAST_VALUE(d.day_avg IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def gap_fill_locf(spark, sf_dir):
    """Time-series gap filling with last-observation-carried-forward:
    per user, a dense daily grid spanning that user's observed range,
    left-joined to the daily total, missing days filled by the
    running `last(ignorenulls)` window — the hypertable resample/LOCF
    primitive.

    Scale shape: the grid explode is O(keys x days) rows built from a
    tiny per-key span table (never a cross join against a calendar
    dim); the fill join and the LOCF window both partition on user_id,
    so AQE plans one co-partitioned exchange feeding both. The first
    grid day is each key's own MIN(day), so value_locf is never null."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("day_avg")
    )
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = span.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    filled = grid.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return filled.select(
        "user_id",
        "day",
        F.col("day_avg").isNull().alias("is_gap"),
        F.last("day_avg", ignorenulls=True).over(w).alias("value_locf"),
    )


@register(
    "event_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS did_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS then_clicked,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_purchase > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS then_purchased
    FROM stages
    """,
)
def event_funnel(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): per user, the first
    timestamp of each stage via conditional MIN, then ordering
    predicates — the standard funnel formulation that needs ONE
    combinable groupBy over the events, never a self-join per stage
    (the naive 3-way self-join shuffles the event table once per
    stage; this shape shuffles conditional-min triples once)."""
    ev = load_table(spark, "events", sf_dir)
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    one, zero = F.lit(1), F.lit(0)
    return stages.agg(
        F.count(one).alias("n_users"),
        F.sum(F.when(viewed, one).otherwise(zero)).cast("long").alias("did_view"),
        F.sum(F.when(clicked, one).otherwise(zero)).cast("long").alias("then_clicked"),
        F.sum(F.when(purchased, one).otherwise(zero)).cast("long").alias("then_purchased"),
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, COUNT(*) AS active_users
    FROM activity WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-activity day,
    counted on each later day they return (first week). The cohort
    frame is one groupBy; its join back to events is co-partitioned on
    user_id (at 100 TB: a broadcast if the user dim fits, else both
    sides already hash on the key); DISTINCT collapses to one row per
    (user, day) before the final combinable count."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .where(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


@register(
    "event_dedup_window",
    oracle="""
    SELECT user_id, event_type, bucket, event_id
    FROM (
      SELECT user_id, event_type, event_id,
             date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 5) MINUTE
               AS bucket,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type,
                 date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 5) MINUTE
               ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def event_dedup_window(spark, sf_dir):
    """Windowed event dedup: keep the first event per (user, type,
    5-minute bucket) — the BATCH twin of the streaming
    dropDuplicatesWithinWatermark path (streaming/events.py), with a
    deterministic (ts, event_id) tiebreak. One shuffle on the dedup
    key; state per key is one row (rank-1 filter), the same bound the
    watermark gives the stream."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    bucket = F.expr(
        "date_trunc('minute', ts) - make_interval(0, 0, 0, 0, 0, CAST(minute(ts) % 5 AS INT), 0)"
    )
    w = Window.partitionBy("user_id", "event_type", "bucket").orderBy("ts", "event_id")
    return (
        ev.withColumn("bucket", bucket)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "bucket", "event_id")
    )


@register(
    "decayed_rolling_features",
    # Bit-stable float contract: both engines sort the collected frame
    # by the (unique-per-user) event time and fold the same linear
    # weights left-to-right, so the double sums are identical before
    # the final round.
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch(ts) AS sec, value FROM events
    ),
    f AS (
      SELECT event_id, user_id, sec,
             list_sort(list(struct_pack(e := sec, v := value)) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)) AS fr
      FROM e
    )
    SELECT event_id, user_id,
           CAST(LEN(fr) AS BIGINT) AS n_frame,
           ROUND(list_sum(list_transform(fr,
             p -> p.v * ((3600.0 - (sec - p.e)) / 3600.0))), 6) AS decayed_sum
    FROM f
    """,
)
def decayed_rolling_features(spark, sf_dir):
    """Time-decayed rolling feature per event: the linearly-decayed
    sum of each user's event values over the trailing hour (weight
    (W - dt)/W, triangular kernel) plus the trailing-frame count — the
    recency-feature shape online feature stores compute for CTR/fraud
    models. A half-life exp(-dt/tau) kernel drops in by swapping the
    weight expression; the linear kernel is registered because libm
    exp() is not bit-portable across engines, which matters only for
    the oracle, not the operator.

    Scale shape: ONE shuffle on user_id (the same exchange
    sessionization pays), then a range-frame window per user — state
    is the trailing hour of one user's events, bounded by event rate x
    window, never the corpus. The frame is array_sort'ed on the
    unique event time so the fold order (and therefore the float sum)
    is deterministic and engine-identical."""
    from pyspark.sql import Window

    e = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", epoch_seconds(F.col("ts")).alias("sec"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 0)
    frame = F.array_sort(
        F.collect_list(F.struct(F.col("sec").alias("e"), F.col("value").alias("v"))).over(w)
    )
    dec = F.expr(
        "aggregate(_f, 0.0D, (acc, p) -> acc + p.v * ((3600.0D - (sec - p.e)) / 3600.0D))"
    )
    return (
        e.withColumn("_f", frame)
        .select(
            "event_id",
            "user_id",
            F.size("_f").cast("long").alias("n_frame"),
            F.round(dec, 6).alias("decayed_sum"),
        )
    )


@register(
    "incremental_agg_merge",
    # The oracle recomputes from scratch — which is precisely the
    # correctness CONTRACT of incremental maintenance: merge(state,
    # delta) must equal recompute(all).
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def incremental_agg_merge(spark, sf_dir):
    """Incremental view maintenance WITHOUT streaming — the nightly-
    batch shape: a persisted per-user aggregate STATE (events before
    the cutoff day) is merged with the new partition's DELTA aggregate
    via one full-outer join, instead of recomputing over all history.
    Count/sum merge by addition, max by greatest — the classic
    'aggregates form a monoid' requirement; avg would be carried as
    (sum, count).

    Scale shape: the delta aggregation touches ONE day of data
    (partition-pruned on the date column in a partitioned table); the
    merge join shuffles state and delta on user_id — both already
    aggregates (one row per user), never raw history. The recompute
    the oracle performs — a full-history scan — is exactly the cost
    this pattern exists to avoid.

    The split here is the corpus's last day vs everything before it;
    the oracle recomputes over all events, so the driver hash verifies
    merge(state, delta) == recompute(all) exactly.

    The sum is carried as DECIMAL(18,2), not double: double addition
    is non-associative, so a double-summed merge(state, delta) could
    round differently from recompute(all) within ~1 ulp of a .005
    boundary and flip the representation-sensitive driver hash.
    ``value`` holds 2-decimal money-like values, so the decimal cast
    is exact on both engines and decimal addition makes the monoid
    merge literally associative — merge == recompute bit-for-bit, by
    construction rather than by luck."""
    e = load_table(spark, "events", sf_dir)
    cutoff = F.lit("2024-01-30 00:00:00").cast("timestamp_ntz")
    agg = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_sv"),
        F.max("ts").alias("last_ts"),
    ]
    state = e.where(F.col("ts") < cutoff).groupBy("user_id").agg(*agg)
    delta = e.where(F.col("ts") >= cutoff).groupBy("user_id").agg(*agg)
    s = state.select(
        "user_id",
        F.col("n_events").alias("n_s"),
        F.col("_sv").alias("sv_s"),
        F.col("last_ts").alias("ts_s"),
    )
    d = delta.select(
        "user_id",
        F.col("n_events").alias("n_d"),
        F.col("_sv").alias("sv_d"),
        F.col("last_ts").alias("ts_d"),
    )
    return s.join(d, "user_id", "full_outer").select(
        "user_id",
        (F.coalesce("n_s", F.lit(0)) + F.coalesce("n_d", F.lit(0))).alias("n_events"),
        (
            F.coalesce(F.col("sv_s"), F.lit("0").cast("decimal(18,2)"))
            + F.coalesce(F.col("sv_d"), F.lit("0").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("sum_value"),
        F.greatest(
            F.coalesce("ts_s", "ts_d"), F.coalesce("ts_d", "ts_s")
        ).alias("last_ts"),
    )


@register(
    "attribution_last_touch",
    # Last-touch marketing attribution: each purchase attributes its
    # revenue to the user's most recent click/view within a 1-hour
    # lookback, else to 'none'. Touches are collapsed to one per
    # (user, ts) — MIN(event_type) — BEFORE the as-of match, so both
    # engines resolve same-timestamp ties identically without
    # depending on the operator's hash tie-break.
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    t1 AS (
      SELECT user_id, ts, MIN(event_type) AS touch_type FROM events
      WHERE event_type IN ('click', 'view') GROUP BY user_id, ts
    ),
    m AS (
      SELECT p.event_id, p.ts, p.value, l.ts AS touch_ts, l.touch_type,
             date_diff('microsecond', l.ts, p.ts) / 1000000.0 AS latency_s
      FROM p LEFT JOIN LATERAL (
        SELECT ts, touch_type FROM t1
        WHERE t1.user_id = p.user_id AND t1.ts <= p.ts
        ORDER BY ts DESC LIMIT 1
      ) l ON true
    ),
    c AS (
      SELECT CASE WHEN touch_ts IS NULL OR latency_s > 3600
                  THEN 'none' ELSE touch_type END AS channel,
             value,
             CASE WHEN touch_ts IS NOT NULL AND latency_s <= 3600
                  THEN latency_s END AS latency_s
      FROM m
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(value), 2) AS attributed_revenue,
           ROUND(AVG(latency_s), 2) AS avg_latency_s
    FROM c GROUP BY channel
    """,
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch attribution through the shared as-of join
    (`operators/asof.py`): purchases match the latest preceding
    click/view per user, revenue rolls up per touch channel with
    'none' for purchases with no touch inside the 1-hour lookback.
    The as-of is the union-window form (one shuffle on the user key,
    no range explosion); touches collapse to one row per (user, ts)
    first so the match is tie-free by construction."""
    e = load_table(spark, "events", sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    touches = (
        e.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts")
        .agg(F.min("event_type").alias("touch_type"))
    )
    m = asof_join(
        purchases, touches, by="user_id", value_cols=("touch_type",)
    )
    # microsecond diff scaled to seconds: engines disagree on how a
    # whole-unit date_diff treats sub-second components (boundary
    # count vs truncation); the microsecond diff is exact on both
    latency = F.expr("timestampdiff(MICROSECOND, matched_ts, ts) / CAST(1000000 AS DOUBLE)")
    attributed = F.col("matched_ts").isNotNull() & (latency <= 3600)
    c = m.select(
        F.when(attributed, F.col("matched_touch_type"))
        .otherwise(F.lit("none"))
        .alias("channel"),
        "value",
        F.when(attributed, latency).alias("latency_s"),
    )
    return c.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("attributed_revenue"),
        F.round(F.avg("latency_s"), 2).alias("avg_latency_s"),
    )


@register(
    "rolling_median_value",
    # Exact rolling median over the trailing 10 events per user —
    # Spark `percentile(0.5)` and DuckDB `quantile_cont(0.5)` share
    # the linear-interpolation (type-7) definition, so the window
    # medians agree bit-for-bit before the final round.
    oracle="""
    SELECT event_id, user_id,
           ROUND(quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS med10
    FROM events
    """,
)
def rolling_median_value(spark, sf_dir):
    """Exact rolling median of the trailing 10 event values per user
    (fraud/anomaly baselining). A ROWS window with the exact
    `percentile` aggregate: the frame holds <= 10 doubles, so exact
    is affordable at any corpus size — the state is O(frame) per
    partition, and the shuffle is the usual one exchange on the
    window key. (Contrast `approx_distinct_stats`, where the
    approximate sketch is the scale path: a trailing-frame median
    has no growing state to approximate away.)"""
    e = load_table(spark, "events", sf_dir)
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-9, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("med10"),
    )


@register("approx_percentile_stats")  # sketch internals differ -> rows-only
def approx_percentile_stats(spark, sf_dir):
    """approx_percentile (KLL-style quantile sketch) next to the
    exact percentile — the 100 TB quantile path, mirrored on
    `approx_distinct_stats`'s pattern of carrying its own exactness
    evidence. Deterministic for fixed data but not oracle-matchable
    (engine-specific sketch); tests/test_oracle.py pins the sketch's
    relative error against the exact columns.

    Output is four SCALAR double columns (not array<double>): the
    driver's rows-only canonicalizer sorts column values to hash
    them, and Python lists are unsortable — the round-6 window slot
    for this query burned with zero evidence because of exactly that
    (`TypeError: unhashable type: 'list'`). Flat scalars keep every
    rows-only query canonicalizable."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx_p50"),
        F.expr("approx_percentile(value, 0.95, 1000)").alias("approx_p95"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.95)").alias("exact_p95"),
    )


@register(
    "gap_fill_interpolate",
    # Linear interpolation between the surrounding observations:
    # interp = prev + (next - prev) * gap_frac with integer day
    # fractions, so both engines compute the identical double before
    # the final round. Edge days are observed by construction (the
    # grid spans each key's own [min, max] day), so prev/next always
    # exist for interior gaps.
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS day_avg
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id),
    grid AS (
      SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.day, d.day_avg,
             CASE WHEN d.day_avg IS NOT NULL THEN g.day END AS obs_day
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    ),
    w AS (
      SELECT user_id, day, day_avg,
             LAST_VALUE(day_avg IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(obs_day IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             FIRST_VALUE(day_avg IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(obs_day IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id, day,
           day_avg IS NULL AS is_gap,
           ROUND(CASE WHEN day_avg IS NOT NULL THEN day_avg
                      ELSE pv + (nv - pv)
                           * (date_diff('day', pd, day) * 1.0
                              / date_diff('day', pd, nd)) END, 6) AS value_interp
    FROM w
    """,
)
def gap_fill_interpolate(spark, sf_dir):
    """Time-series gap filling by LINEAR INTERPOLATION between the
    surrounding observations (the resample primitive complementing
    `gap_fill_locf`'s step-fill): per-user dense daily grid, interior
    gaps get prev + (next-prev) * elapsed-fraction. Same scale shape
    as LOCF — per-key span table, grid explode, two ignore-nulls
    windows over the user partition; one co-partitioned exchange
    feeds the join and both windows."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("day_avg")
    )
    span = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = span.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    j = grid.join(daily, ["user_id", "day"], "left").withColumn(
        "obs_day", F.when(F.col("day_avg").isNotNull(), F.col("day"))
    )
    back = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fwd = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        0, Window.unboundedFollowing
    )
    pv = F.last("day_avg", ignorenulls=True).over(back)
    pd_ = F.last("obs_day", ignorenulls=True).over(back)
    nv = F.first("day_avg", ignorenulls=True).over(fwd)
    nd = F.first("obs_day", ignorenulls=True).over(fwd)
    frac = F.datediff(F.col("day"), pd_) * 1.0 / F.datediff(nd, pd_)
    interp = F.when(F.col("day_avg").isNotNull(), F.col("day_avg")).otherwise(
        pv + (nv - pv) * frac
    )
    return j.select(
        "user_id",
        "day",
        F.col("day_avg").isNull().alias("is_gap"),
        F.round(interp, 6).alias("value_interp"),
    )


@register(
    "rolling_zscore_events",
    # Rolling anomaly score over the trailing-10 frame, with variance
    # computed EXPLICITLY from SUM and SUM(x^2) — engines implement
    # stddev differently (Welford vs sum-of-squares), but the shared
    # formula text makes the doubles identical before rounding.
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value,
             COUNT(*) OVER fr AS n,
             SUM(value) OVER fr AS s,
             SUM(value * value) OVER fr AS s2
      FROM events
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           ROUND(CASE WHEN n >= 2 AND (s2 - s * s / n) / (n - 1) > 0
                      THEN (value - s / n)
                           / sqrt((s2 - s * s / n) / (n - 1)) END, 6) AS zscore
    FROM w
    """,
)
def rolling_zscore_events(spark, sf_dir):
    """Rolling z-score of each event's value against the PRECEDING 10
    events of the same user (anomaly baselining that never peeks at
    the current value). Variance comes from the trailing SUM and
    SUM(x^2) frames via the explicit (s2 - s^2/n)/(n-1) formula — the
    one form both engines evaluate bit-identically; NULL where the
    baseline has <2 points or zero variance. One exchange on the
    user key, O(1) state per frame."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    fr = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-10, -1)
    )
    n = F.count("value").over(fr)
    s = F.sum("value").over(fr)
    s2 = F.sum(F.col("value") * F.col("value")).over(fr)
    var = (s2 - s * s / n) / (n - 1)
    z = F.when((n >= 2) & (var > 0), (F.col("value") - s / n) / F.sqrt(var))
    return ev.select("event_id", "user_id", F.round(z, 6).alias("zscore"))


@register(
    "event_transition_matrix",
    # First-order Markov transition counts between consecutive event
    # types per user, with row-normalized probabilities — integer
    # counts plus one exact division, deterministic tie-break via
    # (ts, event_id) ordering.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ),
    tot AS (SELECT from_type, SUM(n) AS row_n FROM c GROUP BY from_type)
    SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
           ROUND(c.n * 1.0 / t.row_n, 6) AS p
    FROM c JOIN tot t USING (from_type)
    """,
)
def event_transition_matrix(spark, sf_dir):
    """First-order behavioral transition matrix: counts and
    row-normalized probabilities of consecutive event-type pairs per
    user ((ts, event_id) ordering makes the sequence deterministic).
    One window over the user partition, one groupBy over the tiny
    (from, to) space, marginals joined back — the Markov-chain
    summary behind funnel and next-action models."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return c.join(tot, "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * 1.0 / F.col("row_n"), 6).alias("p"),
    )
