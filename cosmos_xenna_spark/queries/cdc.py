"""CDC queries with DuckDB oracles: snapshot merge (upsert/delete
batch, MERGE INTO semantics) and SCD2 history construction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.cdc import (
    incremental_join_merge,
    OP_COL,
    incremental_agg_merge,
    table_diff,
    table_diff_sql,
    merge_upsert,
    scd2_from_changelog,
)
from cosmos_xenna_spark.operators.cache import rescope, scoped_persist
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


# incremental aggregate maintenance: base = per-customer aggregates of
# pre-1997 orders; changelog deletes pre-1995 rows (retention) and
# inserts 1997+ rows. The maintained table must equal a straight
# recompute over orders >= 1995 — which is exactly the oracle.
_BASE_CUT = "1997-01-01 00:00:00"
_DEL_CUT = "1995-01-01 00:00:00"


@register(
    "q_incremental_agg",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING)
                AS DOUBLE) AS sum_o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_DEL_CUT}'
    GROUP BY o_custkey
    """,
    description="materialized-view maintenance: per-key count/sum aggregates "
    "updated from an insert/delete changelog without rescanning base facts "
    "(delta reduced small-side; base split by broadcast anti/semi joins)",
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base_cut = F.lit(_BASE_CUT).cast("timestamp")
    del_cut = F.lit(_DEL_CUT).cast("timestamp")
    base = (
        orders.filter(F.col("o_orderdate") < base_cut)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_o_totalprice"),
        )
    )
    ins = orders.filter(F.col("o_orderdate") >= base_cut).withColumn(OP_COL, F.lit("I"))
    dels = orders.filter(F.col("o_orderdate") < del_cut).withColumn(OP_COL, F.lit("D"))
    merged = incremental_agg_merge(
        base,
        ins.unionByName(dels),
        keys=["o_custkey"],
        sum_cols=["o_totalprice"],
    )
    # The select derives a new frame from the operator's result, which
    # would drop the delta-persist's anchor at build time — rescope the
    # release hooks onto the frame that actually executes.
    out = rescope(
        merged,
        merged.select(
            "o_custkey",
            "n_rows",
            F.col("sum_o_totalprice").cast("double").alias("sum_o_totalprice"),
        ),
    )
    # In production base_agg is a stored table; here it is synthesized
    # by an aggregation that would otherwise be recomputed in both
    # split branches — persist it for the harness run only.
    return scoped_persist(base, out)


_DIFF_OLD = f"""
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_orderdate < TIMESTAMP '{_BASE_CUT}'
"""
_DIFF_NEW = f"""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderdate >= TIMESTAMP '{_DEL_CUT}'
"""


@register(
    "q_table_diff",
    oracle=table_diff_sql(_DIFF_OLD, _DIFF_NEW, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]),
    description="snapshot diff: per-key I/D/U classification between two "
    "table versions (null-safe column compare; unchanged keys omitted) — "
    "one co-partitioned full outer join, classification row-local",
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base_cut = F.lit(_BASE_CUT).cast("timestamp")
    del_cut = F.lit(_DEL_CUT).cast("timestamp")
    old = orders.filter(F.col("o_orderdate") < base_cut).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = orders.filter(F.col("o_orderdate") >= del_cut).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    return table_diff(old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])


@register(
    "q_incremental_join",
    oracle=f"""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           c.c_name, CAST(c.c_nationkey AS BIGINT) AS c_nationkey
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderdate >= TIMESTAMP '{_DEL_CUT}'
    """,
    description="materialized JOIN-view maintenance: orders x customer kept "
    "current from an insert/delete changelog — changed keys anti-joined out "
    "(broadcast, changelog-sized), inserts joined against the dim once; "
    "maintenance cost tracks the change rate, never the view size; oracle "
    "= straight recompute of the repaired join",
)
def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_nationkey").cast("bigint").alias("c_nationkey")
    )
    base_cut = F.lit(_BASE_CUT).cast("timestamp")
    del_cut = F.lit(_DEL_CUT).cast("timestamp")
    fact_cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    base = (
        orders.filter(F.col("o_orderdate") < base_cut)
        .select(*fact_cols)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
    )
    ins = (
        orders.filter(F.col("o_orderdate") >= base_cut)
        .select(*fact_cols)
        .withColumn(OP_COL, F.lit("I"))
    )
    dels = (
        orders.filter(F.col("o_orderdate") < del_cut)
        .select(*fact_cols)
        .withColumn(OP_COL, F.lit("D"))
    )
    merged = incremental_join_merge(
        base,
        ins.unionByName(dels),
        cust,
        fact_keys=["o_orderkey"],
        join_on=F.col("c_custkey") == F.col("o_custkey"),
        op_col=OP_COL,
    )
    return merged.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "c_name",
        "c_nationkey",
    )
