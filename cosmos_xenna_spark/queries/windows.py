"""Window-function surface: ranking, analytic, frames, sessionization.

All window orderings are made fully deterministic (unique-key
tiebreaks) wherever the function's result depends on row order
(row_number, ntile, lag/lead); pure value-based functions (rank,
percent_rank, cume_dist, range frames) are deterministic under ties by
definition. At scale these are single-shuffle operators: partitionBy
keys hash-partition, in-partition sort is local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table, register_views
from cosmos_xenna_spark.functions import dec, revenue_col, REVENUE_SQL
from cosmos_xenna_spark.queries import register


@register(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           CAST(row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
           CAST(rank()       OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS BIGINT) AS drnk
    FROM customer
    """,
    description="ranking: row_number (total order) + rank/dense_rank (with ties)",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    by_bal = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    by_seg = Window.partitionBy("c_nationkey").orderBy("c_mktsegment")
    return cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        F.row_number().over(by_bal).cast("bigint").alias("rn"),
        F.rank().over(by_seg).cast("bigint").alias("rnk"),
        F.dense_rank().over(by_seg).cast("bigint").alias("drnk"),
    )


@register(
    "q_window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER w AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    description="analytic lag/lead over per-user event timeline",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (us - F.lag(us).over(w)).alias("us_since_prev"),
    )


@register(
    "q_window_running",
    oracle=f"""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber, l_partkey, l_suppkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS STRING) AS DOUBLE) AS running_qty,
           CAST(CAST(SUM({REVENUE_SQL})
                OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber, l_partkey, l_suppkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS STRING) AS DOUBLE) AS running_rev
    FROM lineitem
    """,
    description="running (cumulative) decimal-exact sums per order",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data;
    # extend the ordering to the unique triple for determinism.
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        F.sum(dec("l_quantity")).over(w).cast("double").alias("running_qty"),
        F.sum(revenue_col()).over(w).cast("double").alias("running_rev"),
    )


@register(
    "q_window_topk",
    oracle=f"""
    SELECT l_suppkey, l_partkey, part_rev, CAST(rn AS BIGINT) AS rn FROM (
      SELECT l_suppkey, l_partkey,
             CAST(CAST(SUM({REVENUE_SQL}) AS STRING) AS DOUBLE) AS part_rev,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY CAST(CAST(SUM({REVENUE_SQL}) AS STRING) AS DOUBLE) DESC,
                                         l_partkey) AS rn
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ) WHERE rn <= 3
    """,
    description="top-k per group: top-3 parts per supplier by exact revenue",
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(revenue_col()).cast("double").alias("part_rev")
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("part_rev"), F.asc("l_partkey"))
    return (
        agg.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_window_ntile_pct",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
           percent_rank() OVER (ORDER BY c_acctbal) AS pct_rank,
           cume_dist()    OVER (ORDER BY c_acctbal) AS cdist
    FROM customer
    """,
    description="distribution functions: ntile / percent_rank / cume_dist "
    "[oracle-shape: global window, single-partition by construction; the "
    "scale-safe equivalent is q_distribution_distributed]",
)
def q_window_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    total = Window.orderBy("c_acctbal", "c_custkey")
    by_bal = Window.orderBy("c_acctbal")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(total).cast("bigint").alias("quartile"),
        F.percent_rank().over(by_bal).alias("pct_rank"),
        F.cume_dist().over(by_bal).alias("cdist"),
    )


@register(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                                    AND CURRENT ROW) AS n_last_10m,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                                AND CURRENT ROW) AS STRING) AS DOUBLE) AS v_last_10m
    FROM events
    """,
    description="time-range window frame: trailing 10-minute count/sum per user",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                                        AND CURRENT ROW) AS n_last_10m,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                                    AND CURRENT ROW) AS STRING) AS DOUBLE) AS v_last_10m
        FROM events
        """
    )


@register(
    "q_window_rows_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (ORDER BY o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS STRING) AS DOUBLE)
             / COUNT(*) OVER (ORDER BY o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
             AS centered_avg,
           first_value(o_orderkey) OVER (ORDER BY o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS first_k,
           last_value(o_orderkey)  OVER (ORDER BY o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS last_k
    FROM orders
    """,
    description="sliding rows frame: centered moving average + "
    "first/last_value [oracle-shape: global window, single-partition by "
    "construction; partition-keyed frames (q_window_range_frame, "
    "q_window_running) are the scale path]",
)
def q_window_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey").rowsBetween(-2, 2)
    # AVG over decimal differs in result scale between engines; build it
    # from exact sum/count so the double division is identical.
    return orders.select(
        "o_orderkey",
        (F.sum(dec("o_totalprice")).over(w).cast("double") / F.count(F.lit(1)).over(w))
        .alias("centered_avg"),
        F.first("o_orderkey").over(w).alias("first_k"),
        F.last("o_orderkey").over(w).alias("last_k"),
    )


@register(
    "q_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTES
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    description="batch sessionization: 30-min-gap islands via lag + cumsum",
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev_us = F.lag(F.unix_micros("ts")).over(order)
    new_session = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us >= gap_us), 1
    ).otherwise(0)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(running))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
    )


@register(
    "q_global_rank_distributed",
    oracle="""
    SELECT c_custkey,
           CAST(row_number() OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rn
    FROM customer
    """,
    description="exact global row_number via range-partition + offset "
    "arithmetic — the scale-safe form of a global window (no "
    "all-rows-to-one-partition collapse)",
)
def q_global_rank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.ranking import global_row_number

    cust = load_table(spark, sf_dir, "customer")
    return global_row_number(cust, ["c_acctbal", "c_custkey"]).select(
        "c_custkey", F.col("rn").cast("bigint").alias("rn")
    )


@register(
    "q_distribution_distributed",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
           percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pct_rank
    FROM customer
    """,
    description="scale-safe ntile/percent_rank: computed arithmetically "
    "from the distributed global row number (no single-partition window)",
)
def q_distribution_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.ranking import global_row_number

    cust = load_table(spark, sf_dir, "customer")
    ranked = global_row_number(cust, ["c_acctbal", "c_custkey"])
    n_df = ranked.agg(F.count(F.lit(1)).alias("__n"))
    k = 4
    rn, n = F.col("rn"), F.col("__n")
    # SQL ntile: the first (n % k) buckets take ceil(n/k) rows, the rest
    # take floor(n/k) — reproduced arithmetically from the global rank
    size_small = (n / k).cast("long")
    n_big = n % k
    size_big = size_small + 1
    big_span = n_big * size_big
    quartile = (
        F.when(rn <= big_span, ((rn - 1) / size_big).cast("long") + 1)
        .otherwise(n_big + ((rn - big_span - 1) / size_small).cast("long") + 1)
        .cast("bigint")
    )
    pct = ((rn - 1).cast("double") / (n - 1).cast("double"))
    return (
        ranked.crossJoin(F.broadcast(n_df))
        .select(
            "c_custkey",
            quartile.alias("quartile"),
            pct.alias("pct_rank"),
        )
    )


@register(
    "q_window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="first_value / last_value (full frame) / nth_value over "
    "per-customer order history — window analytic completeness",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wfull).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )
