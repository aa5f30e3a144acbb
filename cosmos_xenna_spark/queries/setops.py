"""Set operations: union / intersect / except, distinct and ALL variants.

Spark maps these 1:1 to Catalyst set operators; INTERSECT/EXCEPT become
semi/anti joins with distinct, the ALL variants use a count-based
expansion. Inputs are date-sliced views of the same fact table so the
overlaps are non-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.queries import register

_SLICE_A = ("1996-01-01 00:00:00", "1999-01-01 00:00:00")
_SLICE_B = ("1998-01-01 00:00:00", "2001-01-01 00:00:00")


def _slices(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(
        (F.col("l_shipdate") >= _SLICE_A[0]) & (F.col("l_shipdate") < _SLICE_A[1])
    ).select("l_orderkey", "l_returnflag")
    b = li.filter(
        (F.col("l_shipdate") >= _SLICE_B[0]) & (F.col("l_shipdate") < _SLICE_B[1])
    ).select("l_orderkey", "l_returnflag")
    return a, b


_SLICE_A_SQL = f"""SELECT l_orderkey, l_returnflag FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_SLICE_A[0]}' AND l_shipdate < TIMESTAMP '{_SLICE_A[1]}'"""
_SLICE_B_SQL = f"""SELECT l_orderkey, l_returnflag FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_SLICE_B[0]}' AND l_shipdate < TIMESTAMP '{_SLICE_B[1]}'"""


@register(
    "q_union_all",
    oracle=f"""
    SELECT l_orderkey, l_returnflag, COUNT(*) AS n
    FROM (({_SLICE_A_SQL}) UNION ALL ({_SLICE_B_SQL}))
    GROUP BY l_orderkey, l_returnflag
    """,
    description="UNION ALL (multiset) of two date slices + agg",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.unionAll(b).groupBy("l_orderkey", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q_union_distinct",
    oracle=f"""
    ({_SLICE_A_SQL}) UNION ({_SLICE_B_SQL})
    """,
    description="UNION (distinct) of two date slices",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.union(b).distinct()


@register(
    "q_intersect",
    oracle=f"""
    ({_SLICE_A_SQL}) INTERSECT ({_SLICE_B_SQL})
    """,
    description="INTERSECT (distinct) of overlapping slices",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.intersect(b)


@register(
    "q_except",
    oracle=f"""
    ({_SLICE_A_SQL}) EXCEPT ({_SLICE_B_SQL})
    """,
    description="EXCEPT (distinct): rows only in the earlier slice",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.subtract(b)


@register(
    "q_intersect_all",
    oracle=f"""
    SELECT l_orderkey, l_returnflag, COUNT(*) AS n FROM (
      ({_SLICE_A_SQL}) INTERSECT ALL ({_SLICE_B_SQL})
    ) GROUP BY l_orderkey, l_returnflag
    """,
    description="INTERSECT ALL (multiset) + count per surviving key",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.intersectAll(b).groupBy("l_orderkey", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q_except_all",
    oracle=f"""
    SELECT l_orderkey, l_returnflag, COUNT(*) AS n FROM (
      ({_SLICE_A_SQL}) EXCEPT ALL ({_SLICE_B_SQL})
    ) GROUP BY l_orderkey, l_returnflag
    """,
    description="EXCEPT ALL (multiset difference) + count per surviving key",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _slices(spark, sf_dir)
    return a.exceptAll(b).groupBy("l_orderkey", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_key, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS kind FROM supplier
    """,
    description="unionByName across differently-ordered projections "
    "(column alignment by name, not position)",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS entity_key", "'customer' AS kind"
    )
    # deliberately reversed column order: unionByName must align by name
    supp = load_table(spark, sf_dir, "supplier").selectExpr(
        "'supplier' AS kind", "s_suppkey AS entity_key"
    )
    return cust.unionByName(supp)
