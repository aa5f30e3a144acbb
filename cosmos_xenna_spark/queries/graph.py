"""Graph analytics query: fixed-point PageRank over the nation-level
trade graph (customer nation -> supplier nation, derived from
lineitem/orders/customer/supplier).  Integer fixed-point arithmetic
makes the 3-iteration result bit-exact against the unrolled-CTE
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.graph import pagerank_fixed, pagerank_fixed_sql
from cosmos_xenna_spark.queries import register

_EDGES_SQL = """
    SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )


@register(
    "q_pagerank",
    oracle=pagerank_fixed_sql(_EDGES_SQL, n_iter=3),
    description="3-iteration fixed-point PageRank on the nation trade graph "
    "(iterative joins; rank table stays per-node sized)",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank_fixed(_edges(spark, sf_dir), n_iter=3)
    return ranks.select(F.col("node").cast("bigint").alias("node"), "rank_fp")
