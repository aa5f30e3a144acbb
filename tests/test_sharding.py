"""Behavioral tests for deterministic shard assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.sharding import assign_shards, shard_summary


def test_count_based_sharding_is_exact(spark):
    """Constant size 1 + shard_size N = exactly N rows per shard."""
    df = spark.range(0, 95).withColumn("sz", F.lit(1))
    out = shard_summary(df, "sz", ["id"], 10).collect()
    sizes = {r["shard_id"]: r["n_rows"] for r in out}
    assert sizes == {i: 10 for i in range(9)} | {9: 5}


def test_shards_follow_the_order(spark):
    df = spark.range(0, 30).withColumn("sz", F.lit(1))
    rows = assign_shards(df, "sz", ["id"], 10).collect()
    for r in rows:
        assert r["shard_id"] == r["id"] // 10


def test_byte_target_within_one_item(spark):
    df = spark.range(0, 200).withColumn("sz", (F.col("id") % 7 + 1).cast("bigint"))
    max_item = 7
    target = 50
    out = shard_summary(df, "sz", ["id"], target).orderBy("shard_id").collect()
    # straddle policy: a boundary item belongs to the shard it starts
    # in, so every non-final shard's total is within one max-item of
    # the target on either side
    for r in out[:-1]:
        assert target - max_item < r["total_size"] < target + max_item


def test_partitioning_invariance(spark):
    df = spark.range(0, 500).withColumn("sz", (F.col("id") * 13 % 29 + 1).cast("bigint"))
    a = sorted(map(tuple, assign_shards(df, "sz", ["id"], 100).collect()))
    b = sorted(map(tuple, assign_shards(df.repartition(17), "sz", ["id"], 100).collect()))
    assert a == b


def test_rejects_bad_shard_size(spark):
    df = spark.range(1).withColumn("sz", F.lit(1))
    with pytest.raises(ValueError):
        assign_shards(df, "sz", ["id"], 0)
