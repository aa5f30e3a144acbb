"""CDC queries with DuckDB oracles: snapshot merge (upsert/delete
batch, MERGE INTO semantics) and SCD2 history construction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.cdc import OP_COL, merge_upsert, scd2_from_changelog
from cosmos_xenna_spark.queries import register

_ORDER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "q_merge_upsert",
    oracle="""
    WITH touched AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey FROM orders
      WHERE o_orderkey % 11 <> 0 AND o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000 FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey NOT IN (SELECT k FROM touched)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2,
           o_orderdate, 'MERGED'
    FROM orders WHERE o_orderkey % 11 <> 0 AND o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 13 = 0
    """,
    description="MERGE INTO semantics on a snapshot: deterministic "
    "delete/update/insert change batch, broadcast anti-join + union "
    "(snapshot side never shuffles)",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    k = F.col("o_orderkey")
    deletes = o.filter(k % 11 == 0).withColumn(OP_COL, F.lit("delete"))
    updates = (
        o.filter((k % 11 != 0) & (k % 7 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderpriority", F.lit("MERGED"))
        .withColumn(OP_COL, F.lit("upsert"))
    )
    inserts = (
        o.filter(k % 13 == 0)
        .withColumn("o_orderkey", k + 10000000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn(OP_COL, F.lit("upsert"))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    return merge_upsert(o, changes, ["o_orderkey"])


@register(
    "q_merge_upsert_backfill",
    oracle="""
    WITH touched AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey FROM orders
      WHERE o_orderkey % 5 <> 0 AND o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey + 20000000 FROM orders WHERE o_orderkey % 17 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey NOT IN (SELECT k FROM touched)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 3,
           o_orderdate, 'BACKFILL'
    FROM orders WHERE o_orderkey % 5 <> 0 AND o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey + 20000000, o_custkey, 'N', o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 17 = 0
    """,
    description="MERGE INTO in the backfill regime: a change set >50% "
    "of the snapshot applied with broadcast=False (shuffled anti-join "
    "on the key — the path taken when the change batch exceeds "
    "executor memory); results identical to the broadcast path",
)
def q_merge_upsert_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    k = F.col("o_orderkey")
    deletes = o.filter(k % 5 == 0).withColumn(OP_COL, F.lit("delete"))
    updates = (
        o.filter((k % 5 != 0) & (k % 3 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 3)
        .withColumn("o_orderpriority", F.lit("BACKFILL"))
        .withColumn(OP_COL, F.lit("upsert"))
    )
    inserts = (
        o.filter(k % 17 == 0)
        .withColumn("o_orderkey", k + 20000000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn(OP_COL, F.lit("upsert"))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    return merge_upsert(o, changes, ["o_orderkey"], broadcast=False)


@register(
    "q_scd2_history",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="SCD2 history from a change log: per-entity versions "
    "with valid_from/valid_to/is_current via one window shuffle",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return scd2_from_changelog(
        log, key="o_custkey", ts_col="o_orderdate", order_tiebreak=("o_orderkey",)
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "valid_from",
        "valid_to",
        "is_current",
    )
