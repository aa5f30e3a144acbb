"""Bloom-prefiltered semi/anti join queries.  The oracle is the plain
semi/anti join — the Bloom bitset is an exactness-preserving pruning
step, which is precisely the claim these queries verify."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.bloom import bloom_anti_join, bloom_semi_join
from cosmos_xenna_spark.queries import register

_URGENT = "o_orderpriority = '1-URGENT' AND o_totalprice > 250000"


@register(
    "q_bloom_semi_join",
    oracle=f"""
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE {_URGENT})
    """,
    description="semi join Bloom-pruned to a row-local bitset probe + exact "
    "join on the surviving sliver (broadcast is bits, not keys)",
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000))
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return bloom_semi_join(li, keys, "l_orderkey").select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        "l_extendedprice",
    )


@register(
    "q_bloom_decontaminate",
    oracle="""
    SELECT doc_id FROM documents
    WHERE text NOT IN (SELECT text FROM documents WHERE doc_id % 17 = 0)
    """,
    description="anti-join decontamination: Bloom 'no' rows kept without any "
    "join; only the maybe-sliver runs the exact anti join",
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    contaminated = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    return bloom_anti_join(docs, contaminated, "text").select("doc_id")
