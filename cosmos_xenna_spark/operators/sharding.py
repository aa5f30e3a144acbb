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
