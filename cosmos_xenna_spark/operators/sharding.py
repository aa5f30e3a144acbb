"""Deterministic output-shard assignment (webdataset-style layout).

Training dataloaders want the corpus split into shards of roughly
equal size in a stable, reproducible order.  ``assign_shards`` maps
every row to a shard id from the exact global prefix sum of its size
column over a caller-chosen total order:

    shard_id = floor(exclusive_prefix_size / shard_size)

Rows are never split; a row that straddles a boundary begins the
overflow into the next shard, so shards are within one item of the
byte target (the standard approximate-target policy; for exact-item
counts pass the constant size 1 and ``shard_size=items_per_shard``,
which makes every shard exactly that many rows).

Scale shape: the prefix sum is :func:`operators.ranking.global_cumsum`
— quantile buckets + driver-literal offsets, one shuffle, never a
single-partition window.  The assignment itself is a row-local
expression on top.

Reference parity: the reference writes its outputs one task at a time
from Ray workers (no shard-layout control at all); this is the
engine-level replacement for the "tar up N samples per shard" step
that follows curation in a video/data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.ranking import global_cumsum


def assign_shards(
    df: DataFrame,
    size_col: str,
    order_cols: list[str],
    shard_size: int,
    out_col: str = "shard_id",
) -> DataFrame:
    """Add ``out_col``: the 0-based output shard for each row.

    ``size_col`` must be integral and non-negative; ``order_cols``
    must define a total order (the deterministic layout order).
    """
    if shard_size <= 0:
        raise ValueError(f"shard_size must be positive, got {shard_size}")
    inc = global_cumsum(df, size_col, order_cols, out_col="__cum")
    return (
        inc.withColumn("__exc", F.col("__cum") - F.col(size_col).cast("bigint"))
        # bigint floor division (sizes are non-negative): stays exact
        # where double division would lose precision past 2^53
        .withColumn(out_col, F.expr(f"__exc div {int(shard_size)}"))
        .drop("__cum", "__exc")
    )


def shard_summary(
    df: DataFrame,
    size_col: str,
    order_cols: list[str],
    shard_size: int,
) -> DataFrame:
    """Per-shard layout report: ``(shard_id, n_rows, total_size)``."""
    assigned = assign_shards(df, size_col, order_cols, shard_size)
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(size_col).cast("bigint")).alias("total_size"),
    )


def shard_rebalance_report(
    df: DataFrame,
    key_col: str,
    n_shards: int = 8,
) -> DataFrame:
    """How many keys MOVE when the shard count grows n -> n+1, for two
    assignment schemes side by side: modulo hashing (moves ~n/(n+1) of
    all keys — the resharding catastrophe) and rendezvous/HRW hashing
    (moves ~1/(n+1) — the minimal-disruption property that makes HRW
    the right scheme for stateful shards).  The planning query to run
    BEFORE a resharding, not after.

    Exact ppm over the distinct key set.  HRW argmax is computed by
    exploding the (n+1)-shard candidate list per key and taking one
    window max — (n+1) rows per key, engine-portable (no struct-max
    semantics relied on); mod assignment is row-local arithmetic.
    """
    from cosmos_xenna_spark.functions import md5_long63

    keys = df.select(F.col(key_col).cast("string").alias("k")).distinct()
    h = md5_long63(F.col("k"), prefix="shard:")
    mod_moved = (
        F.pmod(h, F.lit(n_shards)) != F.pmod(h, F.lit(n_shards + 1))
    ).cast("bigint")
    mod = keys.select(mod_moved.alias("moved")).agg(
        F.lit("mod").alias("scheme"),
        F.sum("moved").cast("bigint").alias("n_moved"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    # HRW: argmax_s md5(key || shard) over s in 0..n (the n+1 world);
    # the n-world winner is the argmax restricted to s < n
    cand = keys.select(
        "k",
        F.explode(
            F.array(*[F.lit(s) for s in range(n_shards + 1)])
        ).alias("s"),
    ).withColumn(
        "hs",
        md5_long63(F.concat(F.col("k"), F.lit("#"), F.col("s").cast("string"))),
    )
    agg = cand.groupBy("k").agg(
        F.max_by("s", "hs").alias("win_n1"),
        F.max_by(
            F.when(F.col("s") < n_shards, F.col("s")),
            F.when(F.col("s") < n_shards, F.col("hs")),
        ).alias("win_n"),
    )
    hrw = agg.select(
        (F.col("win_n") != F.col("win_n1")).cast("bigint").alias("moved")
    ).agg(
        F.lit("hrw").alias("scheme"),
        F.sum("moved").cast("bigint").alias("n_moved"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        mod.unionByName(hrw)
        .select(
            "scheme",
            "n_moved",
            "n_keys",
            F.expr("1000000 * n_moved div n_keys").cast("bigint").alias("moved_ppm"),
        )
    )


def shard_rebalance_report_sql(
    table_sql: str, key_col: str, n_shards: int = 8
) -> str:
    from cosmos_xenna_spark.functions import md5_long63_sql

    h = md5_long63_sql("k", prefix="shard:")
    hs = md5_long63_sql("concat(k, '#', CAST(s AS VARCHAR))")
    return f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT CAST({key_col} AS VARCHAR) AS k FROM ({table_sql})
    ),
    mod AS (
      SELECT 'mod' AS scheme,
             CAST(SUM(CASE WHEN h % {n_shards} <> h % {n_shards + 1}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM (SELECT {h} AS h FROM keys)
    ),
    cand AS (
      SELECT k, s, {hs} AS hs
      FROM keys, UNNEST(range({n_shards + 1})) AS t(s)
    ),
    winners AS (
      SELECT k,
             arg_max(s, hs) AS win_n1,
             arg_max(CASE WHEN s < {n_shards} THEN s END,
                     CASE WHEN s < {n_shards} THEN hs END) AS win_n
      FROM cand GROUP BY k
    ),
    hrw AS (
      SELECT 'hrw' AS scheme,
             CAST(SUM(CASE WHEN win_n <> win_n1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_moved,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM winners
    )
    SELECT scheme, n_moved, n_keys,
           CAST(1000000 * n_moved // n_keys AS BIGINT) AS moved_ppm
    FROM (SELECT * FROM mod UNION ALL SELECT * FROM hrw)
    """
