"""Skew-mitigation queries: salted plans must produce byte-identical
results to their unsalted oracles — the salt is an execution detail,
never a semantic one."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import dsum_sql
from cosmos_xenna_spark.operators.skew import salted_agg, salted_join
from cosmos_xenna_spark.queries import register


@register(
    "q_salted_agg",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    description="two-phase salted aggregation over a hot key: identical "
    "result to the plain groupBy, skew spread over 16 reducers",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__qty_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        unique_col="l_orderkey",
        n_salt=16,
        sums=["__qty_dec"],
    )
    return out.select(
        "l_returnflag", "n", F.col("sum___qty_dec").cast("double").alias("sum_qty")
    )


@register(
    "q_salted_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
    description="salted equi-join (big side salted, small side replicated "
    "x16): identical rows to the plain join",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey"), F.col("o_custkey").alias("c_custkey"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = salted_join(orders, cust, key="c_custkey", unique_col="o_orderkey", n_salt=16)
    return joined.select(
        "o_orderkey", F.col("c_custkey").alias("o_custkey"), "c_name"
    )
