"""Core relational queries: scan + filter + aggregate + sort (+ cube/rollup).

Pure Catalyst delegation (SURVEY.md §2.B): filters and projections push
into the parquet scan, aggregates run as partial+final HashAggregate
pairs, and sorting is a final exchange. Reference parity note: the
reference engine has *no* relational operators (SURVEY.md §2.A,
reference ``cosmos_xenna/pipelines/private/specs.py:285-299`` has only a
user-defined map) — this module is the declared Spark-native surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import (
    CHARGE_SQL,
    REVENUE_SQL,
    charge_col,
    davg,
    davg_sql,
    dec,
    dstddev_samp,
    dstddev_samp_sql,
    dsum,
    dsum_sql,
    revenue_col,
)
from cosmos_xenna_spark.operators.layout import zorder_key_sql
from cosmos_xenna_spark.queries import register

_Q1_CUTOFF = "2000-09-02 00:00:00"


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           CAST(CAST(SUM({REVENUE_SQL}) AS STRING) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM({CHARGE_SQL}) AS STRING) AS DOUBLE) AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 shape: scan+filter+8-agg groupBy (flagship)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(revenue_col()).cast("double").alias("sum_disc_price"),
            F.sum(charge_col()).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(CAST(SUM({REVENUE_SQL}) AS STRING) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3 shape: 3-way join + agg + deterministic top-10",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(CAST(SUM({REVENUE_SQL}) AS STRING) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey  = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    description="TPC-H Q5 shape: 6-way snowflake join, broadcast dims",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
    )


@register(
    "q_agg_features",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           {davg_sql('l_quantity')} AS avg_qty,
           {dstddev_samp_sql('l_quantity')} AS std_qty,
           {dsum_sql('l_tax', 'DECIMAL(18,2)')} AS sum_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="aggregate feature matrix: count/count-distinct/min/max/avg/stddev",
)
def q_agg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        davg("l_quantity").alias("avg_qty"),
        dstddev_samp("l_quantity").alias("std_qty"),
        dsum("l_tax").alias("sum_tax"),
    )


@register(
    "q_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="grouping sets: CUBE over (returnflag, linestatus)",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "q_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="grouping sets: ROLLUP over (returnflag, linestatus)",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice").alias("sum_price")
    )


@register(
    "q_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipmode
    FROM (SELECT l_returnflag, l_linestatus,
                 CASE WHEN l_linenumber % 2 = 0 THEN 'EVEN' ELSE 'ODD' END AS l_shipmode
          FROM lineitem)
    """,
    description="DISTINCT / dropDuplicates over derived low-cardinality columns",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.when(F.col("l_linenumber") % 2 == 0, "EVEN").otherwise("ODD").alias("l_shipmode"),
        )
        .dropDuplicates()
    )


@register(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    description="global sort with full tiebreak + limit (top-k)",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_having_filter",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS total_spend
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    """,
    description="filter + groupBy + HAVING-style post-aggregation filter",
)
def q_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .filter(F.col("n_orders") >= 5)
    )


@register(
    "q_predicates",
    oracle="""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('R', 'A')
      AND l_linestatus LIKE 'F%'
      AND l_shipdate IS NOT NULL
      AND NOT (l_discount > 0.05 AND l_tax > 0.05)
    """,
    description="predicate algebra: BETWEEN / IN / LIKE / IS NULL / NOT-AND",
)
def q_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("R", "A")
        & F.col("l_linestatus").like("F%")
        & F.col("l_shipdate").isNotNull()
        & ~((F.col("l_discount") > 0.05) & (F.col("l_tax") > 0.05))
    ).select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        "l_quantity",
        "l_returnflag",
    )


@register(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           COUNT(*) AS n, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    description="explicit GROUPING SETS with GROUPING() null-disambiguation "
    "flags (cube/rollup cover the other grouping-set shapes)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
               COUNT(*) AS n, {dsum_sql('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount', 'DECIMAL(18,4)')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6 shape: tight-filter scan + single global sum "
    "(pushdown carries all three predicates to the scan)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                dec("l_extendedprice").cast("decimal(18,4)")
                * dec("l_discount").cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(SUM({REVENUE_SQL}) AS STRING) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1993-10-01' AND o_orderdate < DATE '1994-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10 shape: returned-item revenue per customer, "
    "dims broadcast, top-20 by exact decimal revenue",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1993-10-01") & (F.col("o_orderdate") < "1994-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 100
    """,
    description="TPC-H Q18 shape: large-volume orders via HAVING over an "
    "exact decimal sum, top-100",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.sum(dec("l_quantity"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(qty.cast("double").alias("total_qty"), qty.alias("__q"))
        .filter(F.col("__q") > 250)
        .drop("__q")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN rev
                         ELSE CAST(0 AS DECIMAL(16,4)) END) AS STRING) AS DOUBLE)
             / CAST(CAST(SUM(rev) AS STRING) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {REVENUE_SQL} AS rev,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
    )
    GROUP BY o_year
    """,
    description="TPC-H Q8 shape: national market share — share of one "
    "supplier nation's revenue inside a region's ECONOMY-part trade; "
    "exact-decimal numerator/denominator so the ratio is bit-stable",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    rev = revenue_col().cast("decimal(16,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_6", rev).otherwise(
                        F.lit(0).cast("decimal(16,4)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    description="TPC-H Q13 shape: orders-per-customer histogram via "
    "left outer join + two-level aggregation (all-integer output)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_SQL}
                             ELSE CAST(0 AS DECIMAL(14,4)) END) AS STRING) AS DOUBLE)
             / CAST(CAST(SUM({REVENUE_SQL}) AS STRING) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'
    """,
    description="TPC-H Q14 shape: promo revenue share for one month; "
    "broadcast part dim, conditional exact-decimal sums",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    rev = revenue_col().cast("decimal(14,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(14,4)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({REVENUE_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    description="TPC-H Q15 shape: top supplier by quarterly revenue — "
    "agg reused for both the ranking and the scalar max (exact decimal "
    "comparison, so ties are well-defined cross-engine)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue_col()).alias("__rev")
    )
    # Scalar max computed once on the driver and baked in as an exact
    # decimal literal — a global rank() window would funnel every
    # supplier aggregate into one partition, which doesn't scale.
    max_rev = revenue.agg(F.max("__rev")).collect()[0][0]
    return (
        revenue.filter(F.col("__rev") == F.lit(max_rev))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("__rev").cast("double").alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS a_partkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS STRING) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#4' AND l_quantity < 0.2 * avg_qty
    """,
    description="TPC-H Q17 shape: small-quantity-order revenue — the "
    "correlated per-part AVG decorrelated into a broadcast-joined "
    "pre-aggregation (exact-decimal avg so the 0.2x threshold is "
    "bit-identical cross-engine)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    li = load_table(spark, sf_dir, "lineitem")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(dec("l_quantity", "decimal(14,2)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part_avg), li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((F.sum(dec("l_extendedprice", "decimal(14,2)")).cast("double") / 7.0).alias("avg_yearly"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(CAST(SUM({REVENUE_SQL}) AS STRING) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    description="TPC-H Q19 shape: disjunctive (OR-of-ANDs) join "
    "predicate; Catalyst keeps the equi-join key and evaluates the "
    "residual disjunction post-join instead of a BNL cross product",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & (q >= 20) & (q <= 30))
    )
    return j.filter(cond).agg(F.sum(revenue_col()).cast("double").alias("revenue"))


@register(
    "q22_dormant_customers",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS STRING) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0
          )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    description="TPC-H Q22 shape (adapted: nationkey stands in for the "
    "phone country code, absent from this schema): wealthy customers "
    "with no orders — scalar-subquery threshold + anti-join, "
    "exact-decimal average for a bit-stable cutoff",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal", "decimal(14,2)")).cast("double") / F.count(F.lit(1))))
        .collect()[0][0]
    )
    return (
        cust.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "decimal(14,2)").alias("totacctbal"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(rev) AS STRING) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             {REVENUE_SQL} AS rev
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3
        AND n1.n_nationkey <> n2.n_nationkey
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7 shape: cross-nation trade volume by year, "
    "double-broadcast of the nation dim under two aliases",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (F.col("n1_key") < 3) & (F.col("n2_key") < 3) & (F.col("n1_key") != F.col("n2_key"))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
    )


@register(
    "q_zorder_key",
    oracle=f"""
    SELECT o_orderkey,
           {zorder_key_sql(['(o_custkey & 65535)', "(CAST(datediff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) & 65535)"], 16)} AS zkey
    FROM orders
    """,
    description="Morton/Z-order layout key over (custkey, order day): flat "
    "shift/or interleave, whole-stage codegen — every file of a z-range "
    "layout becomes a small rectangle in BOTH dims, so min/max stats prune "
    "scans on either predicate (lakehouse OPTIMIZE ZORDER, engine-level)",
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.layout import zorder_key

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date")).cast("bigint")
    keyed = orders.select(
        "o_orderkey",
        (F.col("o_custkey").cast("bigint") % 65536).alias("__x"),
        (day % 65536).alias("__y"),
    )
    return keyed.select(
        "o_orderkey", zorder_key(["__x", "__y"], 16).alias("zkey")
    )


from cosmos_xenna_spark.operators.layout import hilbert_key, hilbert_key_sql  # noqa: E402


@register(
    "q_hilbert_key",
    oracle=hilbert_key_sql(
        "SELECT o_orderkey, o_custkey % 256 AS hx,"
        " CAST(datediff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) % 256 AS hy"
        " FROM orders",
        ["o_orderkey"],
        "hx",
        "hy",
        bits=8,
    ),
    description="Hilbert-curve layout key over (custkey, order day): the "
    "locality-optimal alternative to q_zorder_key — consecutive keys are "
    "always adjacent cells (no Morton jumps), so equal-size key-range "
    "files cover tighter 2-D rectangles and min/max stats prune fewer "
    "false-positive files per range predicate; unrolled xy2d arithmetic "
    "(XOR and reflect+swap as CASE), flat integer exprs, zero shuffles",
)
def q_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date")).cast(
        "bigint"
    )
    keyed = orders.select(
        "o_orderkey",
        (F.col("o_custkey").cast("bigint") % 256).alias("hx"),
        (day % 256).alias("hy"),
    )
    return hilbert_key(keyed, ["o_orderkey"], "hx", "hy", bits=8)


from cosmos_xenna_spark.operators.layout import (  # noqa: E402
    layout_skipping_eval,
    layout_skipping_eval_sql,
)


@register(
    "q_layout_skipping_eval",
    # 96 files (NON-power-of-two: at power-of-two counts both orderings
    # tile the grid into identical aligned blocks and the comparison is
    # a wash) and an unaligned rectangle — the regime real tables live in
    oracle=layout_skipping_eval_sql(
        "SELECT o_custkey % 256 AS x,"
        " CAST(datediff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) % 256"
        " AS y FROM orders",
        "x",
        "y",
        n_files=96,
        rect=(100, 160, 90, 150),
    ),
    description="file-skipping evaluation, Hilbert vs Morton on the SAME "
    "rows: 96 equal-width key-range files per layout (non-power-of-two "
    "by design — aligned block counts make the comparison a wash), "
    "per-file min/max stats, files touched by an unaligned 61x61 "
    "rectangle (x 100..160, y 90..150) under standard pruning + rows "
    "scanned vs matched — the quantified form of the Hilbert locality "
    "claim; one scan, one (layout, file) agg, metadata-scale after that",
)
def q_layout_skipping_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("date")).cast(
        "bigint"
    )
    keyed = orders.select(
        (F.col("o_custkey").cast("bigint") % 256).alias("x"),
        (day % 256).alias("y"),
    )
    return layout_skipping_eval(
        keyed, "x", "y", n_files=96, rect=(100, 160, 90, 150)
    )


from cosmos_xenna_spark.operators.layout import (  # noqa: E402
    bloom_skipping_eval,
    bloom_skipping_eval_sql,
)

_BLOOM_PROBES = (3, 17, 42, 99, 128, 200, 211, 228)


@register(
    "q_bloom_skipping_eval",
    oracle=bloom_skipping_eval_sql(
        # key stride-scrambled so each 32-id file's key set spans the
        # whole [0, 229) domain: min/max zone maps cover every probe
        # (the blind spot), while the Bloom index prunes to the true
        # containers + false positives — a contiguous key (doc_id %
        # 229) would give each file a narrow key RANGE and hide the
        # point-lookup story
        "SELECT doc_id, (doc_id * 131 + 17) % 229 AS key_id FROM documents",
        "doc_id",
        "key_id",
        _BLOOM_PROBES,
    ),
    description="Bloom file-index skipping eval — the point-lookup "
    "complement of q_layout_skipping_eval: files of 32 consecutive ids "
    "(unsorted-ingest layout), exact per-file Bloom (m=256, k=2 md5 "
    "bits) over a uniformly-distributed key; per probe key, files "
    "touched under min/max zone maps (~all of them — the zone-map "
    "blind spot) vs the Bloom index (true containers + ~5% false "
    "positives, never a false negative — certified row-for-row by the "
    "oracle); metadata-scale after one keyed agg",
)
def q_bloom_skipping_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", ((F.col("doc_id") * 131 + 17) % 229).alias("key_id")
    )
    return bloom_skipping_eval(docs, "doc_id", "key_id", _BLOOM_PROBES)
