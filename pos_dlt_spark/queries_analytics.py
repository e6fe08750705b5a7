"""Analytics-breadth queries: as-of join, CUBE/grouping_id, exact
quantiles, approx-distinct validation, and additional TPC-H shapes
(Q4/Q6/Q18/Q22 adapted to the TESTDATA schema).

Registered into the shared ``pos_dlt_spark.queries.REGISTRY`` so the
driver's DuckDB oracle gate covers every entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_dlt_spark.functions import phash_sql
from pos_dlt_spark.operators.asof import asof_join
from pos_dlt_spark.queries import query
from pos_dlt_spark.tables import load_table


@query(
    "events_asof_last_purchase",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           q.event_id AS purchase_event_id,
           q.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'error') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') q
      ON p.user_id = q.user_id AND p.ts >= q.ts
    """,
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event picks up the user's most recent
    at-or-before purchase (point-in-time-correct feature lookup). The
    operator shuffles once on user_id and forward-fills in a sorted scan —
    no range-join pair explosion (operators/asof.py)."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    quotes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        probes,
        quotes,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_values=["purchase_event_id", "purchase_value"],
    )


@query(
    "orders_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def orders_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id — all 4 grouping sets
    in one pass (Spark expands to a single expand+aggregate, no rescan).
    grouping_id bit order matches GROUPING(a, b) in ANSI engines."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )


@query(
    "lineitem_quantity_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def lineitem_quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    ANSI percentile_cont == DuckDB quantile_cont: index p*(n-1), linear
    interpolation). Exact is the oracle-able baseline; approx_percentile
    is the sketch path for 100 TB (different algorithm per engine, so it
    is validated by tolerance in events_user_approx_distinct style, not
    hash equality)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "events_user_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users_exact,
           TRUE AS approx_within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def events_user_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality sketch (approx_count_distinct) validated
    against the exact count: the query itself asserts the sketch lands
    within 5%. The sketch runs at rsd=0.01 so the 5% claim holds with
    ~5-sigma margin at ANY scale — the round-3 sf0.1 gate caught the
    default rsd=0.05 estimate drifting past its own 1-sigma bound for one
    group (HLL is deterministic per input, so a bad cell layout is a
    permanent failure for that dataset, not a flake). At 100 TB the
    sketch replaces the exact distinct's full shuffle with a fixed-size
    mergeable state — this query pins that it stays usable."""
    ev = load_table(spark, sf_dir, "events")
    # Pre-dedup (event_type, user_id) instead of mixing COUNT(DISTINCT)
    # with the sketch in one agg: Catalyst's distinct-agg rewrite keys the
    # FIRST aggregate on (event_type, user_id) and carries the rsd=0.01
    # HLL state — 1639 longs — per (type, user) GROUP through the
    # exchange (~13 KB x n_distinct_pairs shuffled). Deduping first
    # shuffles bare pairs, then one tiny agg per type updates the sketch;
    # HLL is duplicate-insensitive, so the estimate is bit-identical.
    dd = ev.select("event_type", "user_id").distinct()
    return (
        dd.groupBy("event_type")
        .agg(
            F.count("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
        )
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("approx") - F.col("n_users_exact"))
                <= F.greatest(F.col("n_users_exact") * 0.05, F.lit(1.0))
            ).alias("approx_within_5pct"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery -> left-semi join, then count by
    priority. The semi join needs only l_orderkey from the probe side, so
    the scan prunes to one column."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate filter + single global agg —
    the canonical predicate-pushdown showcase (all four filters reach the
    parquet scan; plan test pins PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)") * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING -> aggregate + filter +
    semi join, then the main 3-way join re-aggregates. The HAVING
    pre-aggregate shrinks the semi-join build side to the few hot orders
    before any wide join happens."""
    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("s"))
        .filter(F.col("s") > 250)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(big_orders), orders.o_orderkey == big_orders.l_orderkey, "left_semi"
        )
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .join(li, orders.o_orderkey == li.l_orderkey, "inner")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                   / COUNT(*) AS DECIMAL(18,6))
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (broadcast single-row
    cross join — no driver collect) + anti join + group-agg. The average
    is computed in DECIMAL so both engines compare against the identical
    threshold."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                / F.count(F.lit(1))
            )
            .cast("decimal(18,6)")
            .alias("avg_bal")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem l1
    WHERE l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: compare each row to its group's aggregate
    (correlated scalar subquery). Implemented as a window average over
    l_partkey — one shuffle, no self-join rescan of the fact table, which
    is the halving-the-IO rewrite that matters at 100 TB. The threshold is
    exact across engines: integer-valued quantities sum exactly in double,
    so avg is a correctly-rounded quotient in both."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("avg_q", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_q"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) / 7)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-status and
    per-priority totals in ONE expand+aggregate pass over the scan instead
    of two scans unioned. Declared through the spark.sql entry point — the
    engine's SQL surface is the same Catalyst front end as the DataFrame
    API (reference entry point 2, SURVEY §3.2)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """)


@query(
    "lineitem_approx_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS exact_median,
           TRUE AS approx_within_rank_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def lineitem_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (approx_percentile, Greenwald-Khanna) validated
    in-query against the exact median: the sketch's answer must sit within
    the value range spanned by +-2% of the rank around the true median.
    At 100 TB the sketch's bounded mergeable state replaces the exact
    percentile's full sort — this query pins that the accuracy contract
    holds. (Engines' sketches differ, so the oracle checks the asserted
    tolerance flag, not sketch equality.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("exact_median"),
            F.expr("approx_percentile(l_quantity, 0.5, 100)").alias("approx_median"),
            F.expr("percentile(l_quantity, 0.48)").alias("lo"),
            F.expr("percentile(l_quantity, 0.52)").alias("hi"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            ((F.col("approx_median") >= F.col("lo")) & (F.col("approx_median") <= F.col("hi")))
            .alias("approx_within_rank_tol"),
        )
    )


@query(
    "events_click_attribution_batch",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def events_click_attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch interval join via time-bucketization (operators/rangejoin.py):
    clicks in the hour before each purchase. Same semantics as the
    streaming twin (streaming_stream_stream_join) and the same oracle —
    but as a bucketed equi-join whose per-group fan-in is two adjacent
    hour buckets, not every same-user pair."""
    from pos_dlt_spark.operators.rangejoin import interval_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return interval_join_bucketed(
        purchases,
        clicks,
        on=["user_id"],
        left_time="purchase_ts",
        right_time="click_ts",
        window="1 hour",
    ).select("purchase_id", "click_id", "user_id", "purchase_ts", "click_ts")


@query(
    "orders_window_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_90d,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_orders_90d,
           CAST(date_diff('day', o_orderdate,
               lead(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
             AS INTEGER) AS days_to_next,
           CAST(ntile(4) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS INTEGER) AS date_quartile,
           percent_rank() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice) AS price_pct_rank
    FROM orders
    WHERE o_custkey < 200
    """,
)
def orders_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame coverage: a RANGE frame (trailing 90 days of spend per
    customer, ordered by epoch seconds so both engines share one numeric
    frame definition), lead() gaps, ntile quartiles, and percent_rank —
    each over a total tiebreak order except where SQL tie semantics are
    themselves deterministic (RANGE peers aggregate order-independently;
    percent_rank gives ties equal rank).

    Scale note: all five functions share the PARTITION BY o_custkey key, so
    Catalyst plans ONE shuffle; the two ORDER BY variants become two Window
    nodes over the same exchange, not two shuffles."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    from pyspark.sql import Window

    epoch = F.unix_timestamp("o_orderdate")
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-90 * 86400, Window.currentRow)
    )
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w_range)
        .cast("double")
        .alias("spend_90d"),
        F.count(F.lit(1)).over(w_range).alias("n_orders_90d"),
        F.datediff(F.lead("o_orderdate").over(w_seq), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_next"),
        F.ntile(4).over(w_seq).alias("date_quartile"),
        F.percent_rank().over(w_price).alias("price_pct_rank"),
    )


@query(
    "events_funnel_counts",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.v_ts
        WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.c_ts
        WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_view_click_purchase
    """,
)
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click precedes a
    purchase. Three stage tables, each one aggregation + one equi-join with
    a residual time bound (never a per-row correlated subquery); the three
    scalar counts meet in broadcast single-row cross joins."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .join(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .join(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))))
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, epoch_us(MIN(ts)) // 604800000000 AS cohort_week
        FROM events GROUP BY user_id)
    SELECT cohort_week,
           (epoch_us(e.ts) // 604800000000) - cohort_week AS weeks_since,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted distinct in each subsequent week. Week indexes are exact
    integer epoch-microsecond division (no date_trunc dialect drift).
    The firsts aggregation and the final count share the user_id /
    cohort-key shuffles; nothing touches the driver."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    # `div` = exact bigint floor division, matching DuckDB's `//` — a double
    # division + cast could round up across a week boundary.
    week_of = lambda c: F.expr(f"unix_micros({c}) div 604800000000")  # noqa: E731
    firsts = ev.groupBy("user_id").agg(week_of("min(ts)").alias("cohort_week"))
    return (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week_of("ts") - F.col("cohort_week")).alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "events_hll_mergeable_sketches",
    oracle="""
    WITH per_type AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
        FROM events GROUP BY event_type),
    overall AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events)
    SELECT event_type, n_exact, TRUE AS sketch_within_5pct
    FROM per_type
    UNION ALL
    SELECT '__all__' AS event_type, n_exact, TRUE AS sketch_within_5pct
    FROM overall
    """,
)
def events_hll_mergeable_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL: per-event-type user sketches UNIONED into an
    overall sketch (hll_union_agg) — the property approx_count_distinct
    lacks. At 100 TB this is how distinct counts pre-aggregate: store one
    fixed-size sketch per partition/day, merge at query time instead of
    re-shuffling raw ids. Both levels are validated in-query against the
    exact counts (5% tolerance; sketches are deterministic for fixed
    input), so the gate pins estimate sanity without the oracle needing
    the sketch bits."""
    ev = load_table(spark, sf_dir, "events")
    # pre-dedup pairs: count_distinct next to hll_sketch_agg would make
    # the distinct-agg rewrite carry the lgk=14 sketch state per
    # (event_type, user_id) group through the first exchange; sketches
    # are duplicate-insensitive, so dedup-then-agg is bit-identical
    # (same fix as events_user_approx_distinct)
    dd = ev.select("event_type", "user_id").distinct()
    per_type = dd.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sk"),
        F.count("user_id").alias("n_exact"),
    )
    ok = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
        <= F.greatest(F.col("n_exact") * 0.05, F.lit(1.0))
    ).alias("sketch_within_5pct")
    typed = per_type.select("event_type", "n_exact", ok)
    overall = (
        per_type.agg(
            F.hll_union_agg("sk").alias("sk"),
        )
        .crossJoin(F.broadcast(dd.agg(F.count_distinct("user_id").alias("n_exact"))))
        .select(
            F.lit("__all__").alias("event_type"),
            "n_exact",
            (
                F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
                <= F.greatest(F.col("n_exact") * 0.05, F.lit(1.0))
            ).alias("sketch_within_5pct"),
        )
    )
    return typed.unionByName(overall)


_TS_STEP_US = 21_600_000_000  # 6 hours


@query(
    "events_resampled_6h",
    oracle=f"""
    WITH obs AS (
        SELECT user_id, slot, value FROM (
            SELECT user_id, epoch_us(ts) // {_TS_STEP_US} AS slot, value,
                   row_number() OVER (
                       PARTITION BY user_id, epoch_us(ts) // {_TS_STEP_US}
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase') t
        WHERE rn = 1),
    ranges AS (SELECT user_id, MIN(slot) AS lo, MAX(slot) AS hi FROM obs GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(lo, hi)) AS slot FROM ranges),
    j AS (SELECT g.user_id, g.slot, o.value
          FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.slot = o.slot),
    f AS (
        SELECT user_id, slot, value,
               last_value(value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY slot
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
               last_value(CASE WHEN value IS NOT NULL THEN slot END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY slot
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_slot,
               first_value(value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY slot
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_value,
               first_value(CASE WHEN value IS NOT NULL THEN slot END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY slot
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_slot
        FROM j)
    SELECT user_id, slot, make_timestamp(slot * {_TS_STEP_US}) AS slot_start,
           value, value_ffill,
           CASE WHEN value IS NOT NULL THEN value
                WHEN prev_slot IS NOT NULL AND next_slot IS NOT NULL THEN
                    value_ffill + (next_value - value_ffill)
                    * CAST(slot - prev_slot AS DOUBLE)
                    / CAST(next_slot - prev_slot AS DOUBLE)
                ELSE coalesce(value_ffill, next_value) END AS value_interp
    FROM f
    """,
)
def events_resampled_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators/timeseries.py): each user's
    sparse purchase series resampled onto a 6-hour grid between their
    first and last purchase, with LOCF forward-fill and linear
    interpolation across gaps. Pure DataFrame ops — slot reduction,
    sequence-explode grid, co-partitioned left join, ignorenulls window
    fills; doubles hash-match because both engines evaluate the identical
    fixed-order interpolation expression."""
    from pos_dlt_spark.operators.timeseries import resample_ffill

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return resample_ffill(
        ev, ["user_id"], "ts", "value", _TS_STEP_US, tiebreakers=["event_id"]
    )


_CMS_D, _CMS_W = 4, 1024


def _cms_hash_sql(i: int) -> str:
    return f"{phash_sql('CAST(user_id AS VARCHAR)', f'cms{i}:')} % {_CMS_W}"


@query(
    "events_cms_heavy_hitters",
    oracle=f"""
    WITH cms AS (
        SELECT r, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            {" UNION ALL ".join(f"SELECT {i} AS r, {_cms_hash_sql(i)} AS b FROM events" for i in range(_CMS_D))}
        ) GROUP BY r, b),
    exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM events GROUP BY user_id
        ORDER BY exact_n DESC, user_id LIMIT 20),
    probes AS (
        {" UNION ALL ".join(f"SELECT user_id, exact_n, {i} AS r, {_cms_hash_sql(i)} AS b FROM exact" for i in range(_CMS_D))})
    SELECT p.user_id, p.exact_n, MIN(c.cnt) AS cms_est,
           MIN(c.cnt) >= p.exact_n AS never_underestimates
    FROM probes p JOIN cms c ON p.r = c.r AND p.b = c.b
    GROUP BY p.user_id, p.exact_n
    """,
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for the top-20 exact heavy
    hitters (operators/sketch.py). The exact path shuffles one row per
    distinct key; the sketch bounds the shuffle to d*w = 4096 counter
    cells no matter how many distinct keys exist — the scale path when
    the key domain is unbounded. md5-salted cell hashes make the sketch
    bit-identical in DuckDB, so estimates (not just the guarantee) are
    oracle-gated; `never_underestimates` pins the CMS one-sided-error
    property in both engines."""
    from pos_dlt_spark.operators.sketch import cms_build, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    cms = cms_build(ev, "user_id", d=_CMS_D, w=_CMS_W)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(20)
    )
    est = cms_estimate(cms, exact, "user_id", d=_CMS_D, w=_CMS_W)
    return est.withColumn(
        "never_underestimates", F.col("cms_est") >= F.col("exact_n")
    )


@query(
    "lineitem_exact_correlation",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(
             CAST(COUNT(*) * SUM(qd * pd) - SUM(qd) * SUM(pd) AS DOUBLE)
             / sqrt(CAST(COUNT(*) * SUM(qd * qd) - SUM(qd) * SUM(qd) AS DOUBLE))
             / sqrt(CAST(COUNT(*) * SUM(pd * pd) - SUM(pd) * SUM(pd) AS DOUBLE))
           AS DOUBLE) AS corr_qty_price
    FROM (SELECT l_returnflag,
                 CAST(l_quantity AS BIGINT) AS qd,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pd
          FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def lineitem_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from EXACT co-moments: built-in corr()
    accumulates float co-moments in partition order (never hash-matchable
    across engines); here the five sums are exact integers carried in
    DECIMAL(38,0) (DuckDB: HUGEINT) — safe past 10^38 — and the only
    floats are the final fixed-order expression. Same single-pass
    partial-aggregation plan shape as corr() itself."""
    li = load_table(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("bigint")
    pd_ = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = li.select("l_returnflag", qd.alias("qd"), pd_.alias("pd"))
    agg = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("qd") * F.col("pd"))).alias("sxy"),
        F.sum(d(F.col("qd"))).alias("sx"),
        F.sum(d(F.col("pd"))).alias("sy"),
        F.sum(d(F.col("qd") * F.col("qd"))).alias("sxx"),
        F.sum(d(F.col("pd") * F.col("pd"))).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        "l_returnflag",
        "n",
        (num / F.sqrt(vx) / F.sqrt(vy)).alias("corr_qty_price"),
    )


@query(
    "orders_price_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000.0) AS BIGINT) * 50000.0 AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: one double division + floor per row (both
    engines evaluate the identical op sequence), then a count aggregation
    — the deterministic building block behind distribution profiling;
    width_bucket()/histogram_numeric() are engine-specific and not
    hash-matchable."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("bigint")
    return (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * 50000.0).alias("bucket_lo"),
            "n_orders",
        )
    )


@query(
    "events_heavy_hitters",
    oracle="""
    SELECT event_type, user_id, n FROM (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY COUNT(*) DESC, user_id
               ) AS rk
        FROM events
        GROUP BY event_type, user_id) t
    WHERE rk <= 5
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 heavy hitters per event type: two-phase — a map-side-
    combining count aggregation collapses the raw stream to (type, user)
    cardinality BEFORE the rank window, so the window's sort sees |keys|
    rows, not |events|. The 100 TB shape for 'top accounts by traffic';
    the sketch alternative (approx_top_k) is not hash-matchable."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    counts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "user_id")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("event_type", "user_id", "n")
    )


@query(
    "orders_price_anomalies",
    oracle="""
    WITH moments AS (
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(pd) AS s1, SUM(pd * pd) AS s2
        FROM (SELECT o_custkey,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pd
              FROM orders)
        GROUP BY o_custkey)
    SELECT o.o_orderkey, o.o_custkey,
           CAST((CAST(m.n AS DOUBLE) * CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                 - CAST(m.s1 AS DOUBLE))
                / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)) AS DOUBLE) AS zscore
    FROM orders o JOIN moments m ON o.o_custkey = m.o_custkey
    WHERE m.n >= 5
      AND abs(CAST((CAST(m.n AS DOUBLE) * CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                    - CAST(m.s1 AS DOUBLE))
                   / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)) AS DOUBLE)) > 2.5
    """,
)
def orders_price_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer z-score outliers from EXACT integer moments (same
    determinism device as lineitem_exact_correlation): z = (n*x - s1) /
    sqrt(n*s2 - s1^2) — algebraically n^(1/2)-scaled, so the |z| > 2.5
    threshold is compared on sqrt(n)*z; both engines build the identical
    fixed-order double expression, making even the threshold cut
    hash-stable. One aggregation + one broadcastable join back."""
    orders = load_table(spark, sf_dir, "orders")
    pd_ = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice", pd_.alias("pd"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    moments = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("pd"))).alias("s1"),
        F.sum(d(F.col("pd") * F.col("pd"))).alias("s2"),
    ).filter(F.col("n") >= 5)
    j = base.join(moments.withColumnRenamed("o_custkey", "ck"), F.col("o_custkey") == F.col("ck"))
    z = (
        (F.col("n").cast("double") * (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("double")
         - F.col("s1").cast("double"))
        / F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
    )
    return (
        j.select("o_orderkey", "o_custkey", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > 2.5)
    )


@query(
    "events_sliding_distinct_users",
    oracle="""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events)
    SELECT days.d,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users_7d_exact,
           TRUE AS sketch_within_5pct
    FROM days
    JOIN events e
      ON e.ts >= days.d - INTERVAL 6 DAY
     AND e.ts < days.d + INTERVAL 1 DAY
    GROUP BY days.d
    """,
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day — THE pre-aggregation case
    sketches exist for. Exact sliding distinct cannot reuse daily
    aggregates (distinct does not sum), so at 100 TB you either re-scan 7
    days of raw events per day (the day-grid join the oracle runs, x7
    read amplification) or store ONE fixed-size HLL sketch per day and
    union 7 of them per window — this query computes BOTH: the exact
    count via the day-grid join and the sketch path via hll_union_agg
    over a 6-day-trailing row window on the daily-sketch table, validated
    in-query at 5%."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.hll_sketch_agg("user_id", 14).alias("sk")
    )
    # deliberately UNPARTITIONED window (Spark warns): its input is the
    # per-DAY sketch table — one row per calendar day by construction,
    # bounded by the calendar, not the data (100 TB of events is still
    # ~36.5k rows/decade here). A partition key would break the
    # cross-day trailing range the query exists to compute; the
    # single-partition WindowExec is the right plan at every scale.
    w = (
        Window.orderBy(F.unix_micros(F.col("d")))
        .rangeBetween(-6 * 86400 * 1_000_000, Window.currentRow)
    )
    sketched = daily.select(
        "d", F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est")
    )
    # Pre-dedup (day, user) pairs BEFORE the day-grid range join (guide
    # §2.3 — aggregate before you shuffle; the sketch-agg gates' lesson):
    # distinct-over-a-window equals distinct over the union of daily
    # distinct sets, and the day-boundary grid makes the ts range test
    # equivalent to the same test on date_trunc(ts). The join then
    # amplifies ~|days| x |daily users| rows instead of 7x raw events.
    daily_users = ev.select(
        F.date_trunc("day", F.col("ts")).alias("ud"), "user_id"
    ).distinct()
    days = daily_users.select(F.col("ud").alias("d")).distinct()
    exact = (
        days.join(
            daily_users,
            (F.col("ud") >= F.col("d") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("ud") < F.col("d") + F.expr("INTERVAL 1 DAY")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("n_users_7d_exact"))
    )
    return exact.join(sketched, "d").select(
        "d",
        "n_users_7d_exact",
        (
            F.abs(F.col("est") - F.col("n_users_7d_exact"))
            <= F.greatest(F.col("n_users_7d_exact") * 0.05, F.lit(1.0))
        ).alias("sketch_within_5pct"),
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join behind an explicit Bloom pre-filter
    (operators/bloomjoin.py): the urgent-order keys are aggregated into a
    128 KiB bitmap that drops non-joining lineitem rows IN THE SCAN STAGE,
    before the join's exchange — at 100 TB the fact shuffle, not the join,
    is the cost center, and ~80% of lineitem loses this join. The bitmap is
    transparent to results (false positives are re-checked by the exact
    join), so the oracle is the plain SQL join."""
    from pos_dlt_spark.operators.bloomjoin import bloom_prefilter_join

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderdate"
    )
    joined = bloom_prefilter_join(lineitem, dim, "l_orderkey", "o_orderkey")
    return joined.groupBy("o_orderkey", "o_orderdate").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        )
        .cast("double")
        .alias("revenue"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events),
    cnt AS (
        SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type)
    SELECT event_type, next_type, n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type) AS p
    FROM cnt
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences
    (sequence mining / behavioral fingerprinting): lead() within each
    user's (ts, event_id)-ordered stream, then count and row-normalize per
    source state. Scales: the lead window shuffles once on user_id (high
    cardinality, no skew), the count is a map-side-combined hash aggregate,
    and the normalizing window runs over the tiny (src, dst) state matrix.
    The probability divides two exact counts — deterministic across
    engines."""
    from pyspark.sql import Window

    seq = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    cnt = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cnt.select(
        "event_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("event_type"))).alias("p"),
    )


_PROFILE_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
]


def _profile_oracle() -> str:
    selects = []
    for c in _PROFILE_COLS:
        selects.append(
            f"""SELECT '{c}' AS "column",
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               MIN(TRY_CAST(CAST({c} AS VARCHAR) AS DOUBLE)) AS min_num,
               MAX(TRY_CAST(CAST({c} AS VARCHAR) AS DOUBLE)) AS max_num,
               MIN(CAST({c} AS VARCHAR)) AS min_str,
               MAX(CAST({c} AS VARCHAR)) AS max_str
        FROM lineitem"""
        )
    return "\nUNION ALL ".join(selects)


@query("lineitem_profile", oracle=_profile_oracle())
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan table profiling (operators/profile.py): per-column
    rows / nulls / exact distincts / min-max, melted to (column, value)
    so distinct counting is a two-level hash aggregate — never
    Catalyst's Expand (which replicates every row once per
    COUNT(DISTINCT) in the naive one-agg formulation)."""
    from pos_dlt_spark.operators.profile import profile_table

    # spread=True: the local single-file scan yields ~3 input splits; the
    # melt multiplies rows x n_cols, so parallelize BEFORE the explode
    return profile_table(load_table(spark, sf_dir, "lineitem", spread=True), _PROFILE_COLS)


def _profile_approx_oracle() -> str:
    selects = []
    for c in _PROFILE_COLS:
        selects.append(
            f"""SELECT '{c}' AS "column",
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct_exact,
               TRUE AS approx_within_5pct,
               MIN(TRY_CAST(CAST({c} AS VARCHAR) AS DOUBLE)) AS min_num,
               MAX(TRY_CAST(CAST({c} AS VARCHAR) AS DOUBLE)) AS max_num,
               MIN(CAST({c} AS VARCHAR)) AS min_str,
               MAX(CAST({c} AS VARCHAR)) AS max_str
        FROM lineitem"""
        )
    return "\nUNION ALL ".join(selects)


@query("lineitem_profile_approx", oracle=_profile_approx_oracle())
def lineitem_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based profiler for wide/high-cardinality tables
    (profile_table_approx): distinct counts via one HLL++ sketch per
    column at rsd=0.01, so the shuffle carries fixed-size sketches
    instead of every distinct (column, value) pair — the 100 TB
    first-look path. Gate shape follows events_user_approx_distinct:
    emit the EXACT distinct plus a 5%-tolerance flag on the sketch
    estimate (HLL is engine-specific but deterministic per dataset), so
    the hash compare stays exact while the approx machinery is
    validated."""
    from pos_dlt_spark.operators.profile import profile_table_with_sketch

    df = load_table(spark, sf_dir, "lineitem", spread=True)
    # ONE melt + one two-level aggregate carries both the exact distinct
    # and the sketch (the old approx-join-exact formulation melted the
    # table twice — the melt was 1.45 s of the 3.4 s wall); the sketch
    # aggregates over the exact path's distinct (column, value) pairs,
    # which HLL's duplicate-insensitivity makes bit-identical
    both = profile_table_with_sketch(df, _PROFILE_COLS)
    return both.select(
        "column",
        "n_rows",
        "n_nulls",
        F.col("n_distinct").alias("n_distinct_exact"),
        (
            F.abs(F.col("n_distinct_approx") - F.col("n_distinct"))
            <= 0.05 * F.col("n_distinct")
        ).alias("approx_within_5pct"),
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


@query(
    "events_top_paths",
    oracle="""
    WITH seq AS (
        SELECT event_type AS s1,
               lead(event_type, 1) OVER w AS s2,
               lead(event_type, 2) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
        SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE s3 IS NOT NULL
        GROUP BY s1, s2, s3)
    SELECT s1, s2, s3, n FROM paths
    ORDER BY n DESC, s1, s2, s3
    LIMIT 25
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step user paths (sequence trigrams) — the path-mining
    companion to events_markov_transitions: two lead() offsets over one
    per-user window (one shuffle on user_id, both leads share the sort),
    a map-side-combined trigram count, and a TakeOrderedAndProject
    top-25 with a total tie-break order."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    )
    return (
        seq.filter(F.col("s3").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "s1", "s2", "s3")
        .limit(25)
    )


# -- PageRank over the customer-supplier interaction graph -------------------

_PR_OFF = 10_000_000  # supplier ids offset into their own node-id space


def _pagerank_oracle(iters: int = 3) -> str:
    parts = [
        """pr_eb AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        f"""pr_e AS (SELECT c AS src, s + {_PR_OFF} AS dst FROM pr_eb
        UNION ALL SELECT s + {_PR_OFF} AS src, c AS dst FROM pr_eb)""",
        "pr_nodes AS (SELECT src AS node FROM pr_e UNION SELECT dst FROM pr_e)",
        "pr_deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM pr_e GROUP BY src)",
        "pr_r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM pr_nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""pr_c{i} AS (
            SELECT pr_e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS inbound
            FROM pr_r{i - 1} r
            JOIN pr_deg d ON r.node = d.src
            JOIN pr_e ON pr_e.src = d.src
            GROUP BY pr_e.dst)"""
        )
        parts.append(
            f"""pr_r{i} AS (
            SELECT n.node,
                   CAST(150000 + (COALESCE(c.inbound, 0) * 17) // 20 AS BIGINT) AS rank
            FROM pr_nodes n LEFT JOIN pr_c{i} c ON n.node = c.node)"""
        )
    from pos_dlt_spark.queries_ml import _materialize_ctes

    return (
        "WITH "
        + ",\n".join(_materialize_ctes(parts))
        + f"""
    SELECT node, rank AS rank_micro,
           CAST(rank AS DOUBLE) / 1000000 AS rank
    FROM pr_r{iters}
    """
    )


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, integer micro-units — operators/cluster.py
    :func:`pagerank`) over the bipartite customer<->supplier interaction
    graph (edge when a customer's order shipped from a supplier, both
    directions). The iterative-algorithm companion to connected
    components: per iteration one equi-join + one map-side-combined
    aggregate, lineage truncated per round. Exact integer damping
    (17/20) + integer DIV make the ranks bit-identical across engines;
    the oracle unrolls all three iterations in CTEs."""
    from pos_dlt_spark.operators.cluster import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    eb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = eb.select(
        F.col("c").cast("long").alias("src"),
        (F.col("s") + _PR_OFF).cast("long").alias("dst"),
    ).union(
        eb.select(
            (F.col("s") + _PR_OFF).cast("long").alias("src"),
            F.col("c").cast("long").alias("dst"),
        )
    )
    return pagerank(edges, iters=3)
