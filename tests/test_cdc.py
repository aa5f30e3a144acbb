"""Tests for CDC operators: merge_upsert (MERGE INTO semantics) and
scd2_from_changelog (type-2 history)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.cdc import OP_COL, merge_upsert, scd2_from_changelog


def test_merge_upsert_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (4, "d", "upsert")],
        f"k bigint, v string, {OP_COL} string",
    )
    out = {r["k"]: r["v"] for r in merge_upsert(snap, changes, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}  # 2 replaced, 3 deleted, 4 inserted


def test_merge_upsert_plan_broadcasts_changes(spark):
    snap = spark.createDataFrame([(1, "a")], "k bigint, v string")
    changes = spark.createDataFrame(
        [(1, "A", "upsert")], f"k bigint, v string, {OP_COL} string"
    )
    plan = (
        merge_upsert(snap, changes, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_merge_upsert_backfill_no_broadcast_identical(spark):
    """broadcast=False (backfill regime: change set too big for executor
    memory) must produce identical results through a shuffled anti-join,
    with no BroadcastExchange in the plan."""
    snap = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k bigint, v string"
    )
    changes = spark.createDataFrame(
        [(i, f"V{i}", "upsert" if i % 3 else "delete") for i in range(0, 100, 2)],
        f"k bigint, v string, {OP_COL} string",
    )
    via_broadcast = {
        r["k"]: r["v"]
        for r in merge_upsert(snap, changes, ["k"], broadcast=True).collect()
    }
    shuffled = merge_upsert(snap, changes, ["k"], broadcast=False)
    # AQE may still choose a broadcast for tiny test data; disable its
    # join conversion so the assertion reflects the plan at scale.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = shuffled._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        via_shuffle = {r["k"]: r["v"] for r in shuffled.collect()}
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert via_shuffle == via_broadcast


def test_scd2_versions_and_current_flag(spark):
    t = datetime
    log = spark.createDataFrame(
        [
            (1, t(2024, 1, 1), "v1"),
            (1, t(2024, 2, 1), "v2"),
            (1, t(2024, 3, 1), "v3"),
            (2, t(2024, 1, 15), "only"),
        ],
        "k bigint, ts timestamp, v string",
    )
    hist = scd2_from_changelog(log, key="k", ts_col="ts").orderBy("k", "valid_from")
    rows = hist.collect()
    k1 = [r for r in rows if r["k"] == 1]
    assert [r["v"] for r in k1] == ["v1", "v2", "v3"]
    assert k1[0]["valid_to"] == t(2024, 2, 1) and not k1[0]["is_current"]
    assert k1[1]["valid_to"] == t(2024, 3, 1) and not k1[1]["is_current"]
    assert k1[2]["valid_to"] is None and k1[2]["is_current"]
    (k2,) = [r for r in rows if r["k"] == 2]
    assert k2["is_current"] and k2["valid_from"] == t(2024, 1, 15)


def test_scd2_intervals_partition_time(spark):
    # versions tile the timeline: each valid_from equals the previous
    # version's valid_to, so point-in-time lookups are unambiguous.
    log = spark.createDataFrame(
        [(1, datetime(2024, 1, d), f"v{d}") for d in (3, 1, 2)],
        "k bigint, ts timestamp, v string",
    )
    hist = scd2_from_changelog(log, key="k", ts_col="ts")
    asof = hist.filter(
        (F.col("valid_from") <= datetime(2024, 1, 2, 12))
        & (
            F.col("valid_to").isNull()
            | (F.col("valid_to") > datetime(2024, 1, 2, 12))
        )
    ).collect()
    assert len(asof) == 1 and asof[0]["v"] == "v2"


class TestIncrementalAggMerge:
    def _base(self, spark, rows):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(rows, "k string, v double")
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sum_v"),
        )

    def _merge(self, spark, base_rows, changes):
        from cosmos_xenna_spark.operators.cdc import OP_COL, incremental_agg_merge

        base = self._base(spark, base_rows)
        log = spark.createDataFrame(changes, f"k string, v double, {OP_COL} string")
        out = incremental_agg_merge(base, log, ["k"], ["v"])
        return {
            r["k"]: (r["n_rows"], float(r["sum_v"])) for r in out.collect()
        }

    def test_matches_recompute(self, spark):
        base_rows = [("a", 1.0), ("a", 2.0), ("b", 5.0)]
        changes = [("a", 2.0, "D"), ("a", 10.0, "I"), ("c", 7.0, "I")]
        got = self._merge(spark, base_rows, changes)
        assert got == {"a": (2, 11.0), "b": (1, 5.0), "c": (1, 7.0)}

    def test_key_vanishes_at_zero_count(self, spark):
        got = self._merge(spark, [("a", 3.0)], [("a", 3.0, "D")])
        assert "a" not in got

    def test_untouched_keys_pass_through(self, spark):
        got = self._merge(spark, [("a", 1.0), ("b", 2.0)], [("a", 4.0, "I")])
        assert got["b"] == (1, 2.0)

    def test_shuffled_path_equivalent(self, spark):
        from cosmos_xenna_spark.operators.cdc import OP_COL, incremental_agg_merge

        base = self._base(spark, [("a", 1.0), ("b", 2.0), ("c", 3.0)])
        log = spark.createDataFrame(
            [("a", 9.0, "I"), ("c", 3.0, "D")], f"k string, v double, {OP_COL} string"
        )
        a = sorted(map(tuple, incremental_agg_merge(base, log, ["k"], ["v"]).collect()))
        b = sorted(
            map(
                tuple,
                incremental_agg_merge(base, log, ["k"], ["v"], broadcast=False).collect(),
            )
        )
        assert a == b


def test_table_diff_null_safe_classification(spark):
    from cosmos_xenna_spark.operators.cdc import table_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (3, 30.0, "C"), (4, 40.0, "D")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"),      # unchanged -> omitted
         (2, 20.0, "B"),      # NULL -> value: update (null-safe compare)
         (3, None, "C"),      # value -> NULL: update
         (5, 50.0, "E")],     # inserted; k=4 deleted
        "k long, price double, status string",
    )
    got = {(r.k, r.change) for r in table_diff(old, new, ["k"], ["price", "status"]).collect()}
    assert got == {(2, "U"), (3, "U"), (4, "D"), (5, "I")}


def test_incremental_join_planted(spark):
    from pyspark.sql import functions as F

    from cosmos_xenna_spark.operators.cdc import incremental_join_merge

    dim = spark.createDataFrame([(1, "n1"), (2, "n2")], ["k", "name"])
    base = spark.createDataFrame(
        [(10, 1, 5.0, "n1"), (11, 2, 6.0, "n2"), (12, 1, 7.0, "n1")],
        ["fid", "k", "val", "name"],
    )
    # update fid=11 (D+I with new val), delete fid=12, insert fid=13
    log = spark.createDataFrame(
        [
            (11, 2, 6.0, "D"),
            (11, 2, 60.0, "I"),
            (12, 1, 7.0, "D"),
            (13, 2, 8.0, "I"),
        ],
        ["fid", "k", "val", "op"],
    )
    out = incremental_join_merge(
        base,
        log.select("fid", "k", "val", "op"),
        dim.withColumnRenamed("k", "dk"),
        fact_keys=["fid"],
        join_on=F.col("dk") == F.col("k"),
    )
    got = sorted((r.fid, r.k, r.val, r.name) for r in out.collect())
    assert got == [(10, 1, 5.0, "n1"), (11, 2, 60.0, "n2"), (13, 2, 8.0, "n2")]
