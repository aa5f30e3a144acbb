"""Subquery, pivot/unpivot, and recursive-CTE surface.

Catalyst decorrelates EXISTS/IN/scalar/correlated subqueries into
joins (SURVEY.md §4.1 — free rewrites the reference has no notion of);
these queries pin that surface with oracles. The recursive CTE (new in
Spark 4) builds a month spine for gap-filled time series — the classic
"calendar left join" every analytics pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import dec, dsum_sql
from cosmos_xenna_spark.queries import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "q_subquery_exists",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey
                    AND l.l_shipdate > DATE '1998-06-01')
    """,
    description="correlated EXISTS subquery (decorrelated to a semi-join "
    "by Catalyst)",
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey
                        AND l.l_shipdate > DATE '1998-06-01')
        """
    )


@register(
    "q_subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
    description="IN subquery against a filtered dimension",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        """
    )


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size FROM part
    WHERE p_size > (SELECT CAST(CAST(SUM(p_size) AS STRING) AS DOUBLE) / COUNT(*) FROM part)
    """,
    description="uncorrelated scalar subquery (broadcast single value)",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size FROM part
        WHERE p_size > (SELECT CAST(CAST(SUM(p_size) AS STRING) AS DOUBLE) / COUNT(*) FROM part)
        """
    )


@register(
    "q_subquery_correlated",
    oracle="""
    SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer c1
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * 2 >
          (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS STRING) AS DOUBLE) / COUNT(*)
           FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey)
    """,
    description="correlated scalar subquery: customers above 0.5x their "
    "nation's average balance (decimal-exact per-nation mean)",
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer c1
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * 2 >
              (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS STRING) AS DOUBLE) / COUNT(*)
               FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey)
        """
    )


_SPINE_SQL = """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1992-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1998-12-01'
    ),
    per_month AS (
      SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT CAST(months.m AS DATE) AS month,
           COALESCE(n_orders, 0) AS n_orders
    FROM months LEFT JOIN per_month ON CAST(months.m AS DATE) = CAST(per_month.m AS DATE)
"""


@register(
    "q_recursive_spine",
    oracle=_SPINE_SQL,
    description="recursive CTE month spine + left join: gap-filled "
    "monthly order counts (months with zero orders included)",
)
def q_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_SPINE_SQL)


_PIVOT_VALUES = ["F", "O", "P"]


def _pivot_cols() -> str:
    cols = []
    for v in _PIVOT_VALUES:
        case = "CASE WHEN l_linestatus = '" + v + "' THEN l_quantity END"
        cols.append(f"{dsum_sql(case)} AS qty_{v}")
    return ", ".join(cols)


@register(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag, {_pivot_cols()}
    FROM lineitem GROUP BY l_returnflag
    """,
    description="pivot linestatus into columns (== conditional aggregation)",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", _PIVOT_VALUES)
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )
    for v in _PIVOT_VALUES:
        out = out.withColumnRenamed(v, f"qty_{v}")
    return out


@register(
    "q_unpivot",
    oracle=f"""
    WITH p AS (
      SELECT l_returnflag, {_pivot_cols()}
      FROM lineitem GROUP BY l_returnflag
    )
    {" UNION ALL ".join("SELECT l_returnflag, '" + v + "' AS linestatus, qty_" + v + " AS qty FROM p WHERE qty_" + v + " IS NOT NULL" for v in _PIVOT_VALUES)}
    """,
    description="unpivot (melt) the pivoted matrix back to long form",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", _PIVOT_VALUES)
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )
    for v in _PIVOT_VALUES:
        wide = wide.withColumnRenamed(v, f"qty_{v}")
    return wide.unpivot(
        ids=["l_returnflag"],
        values=[f"qty_{v}" for v in _PIVOT_VALUES],
        variableColumnName="linestatus",
        valueColumnName="qty",
    ).withColumn("linestatus", F.substring("linestatus", 5, 1)).filter(
        F.col("qty").isNotNull()
    )
