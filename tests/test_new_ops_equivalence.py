"""Randomized equivalence tests for the round-6 exactness-contract
operators: each distributed result must match an independent in-memory
reference implementation on random inputs, and must be invariant to
partitioning (the two failure modes oracle fixtures can miss)."""

from __future__ import annotations

import numpy as np
import pytest

SEED = 20260814


def _rng():
    return np.random.default_rng(SEED)


def test_decayed_sum_matches_python_reference(spark):
    from cosmos_xenna_spark.operators.timeseries import decayed_sum

    rng = _rng()
    rows = [
        (int(i), int(rng.integers(0, 5)), float(rng.uniform(0, 100)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {
        r.event_id: r.decayed
        for r in decayed_sum(
            df.withColumn("ts", df.event_id.cast("timestamp")),
            ["user_id"], "ts", "value", horizon=20, order_tiebreak=["event_id"],
        ).collect()
    }
    # reference: per-user ordered scan with dyadic weights
    per_user: dict[int, list[tuple[int, float]]] = {}
    for eid, uid, v in rows:
        per_user.setdefault(uid, []).append((eid, v))
    for uid, seq in per_user.items():
        seq.sort()
        for i, (eid, _v) in enumerate(seq):
            want = sum(
                int(np.floor(seq[i - j][1] * 100)) / (1 << j)
                for j in range(min(i + 1, 20))
            )
            assert got[eid] == want, (uid, eid)  # EXACT, not approx


def test_rolling_zscore_matches_numpy_reference(spark):
    from cosmos_xenna_spark.operators.stats import rolling_zscore

    rng = _rng()
    rows = [
        (int(i), int(rng.integers(0, 3)), float(rng.uniform(-50, 50)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double")
    got = {
        r.event_id: r.zscore
        for r in rolling_zscore(
            df.withColumn("ts", df.event_id.cast("timestamp")),
            ["user_id"], "ts", "value", 20, order_tiebreak=["event_id"],
        ).collect()
    }
    per_user: dict[int, list[tuple[int, float]]] = {}
    for eid, uid, v in rows:
        per_user.setdefault(uid, []).append((eid, v))
    for uid, seq in per_user.items():
        seq.sort()
        cents = [int(np.floor(v * 100)) for _e, v in seq]
        for i, (eid, _v) in enumerate(seq):
            window = cents[max(0, i - 20) : i]
            n = len(window)
            if n < 2:
                assert got[eid] is None
                continue
            s, ssq = sum(window), sum(c * c for c in window)
            var = (ssq - s * s / n) / (n - 1)
            if var <= 0:
                assert got[eid] is None
                continue
            want = (cents[i] - s / n) / np.sqrt(var)
            assert got[eid] == want, (uid, eid)  # EXACT: dyadic contract


def test_table_diff_matches_dict_reference(spark):
    from cosmos_xenna_spark.operators.cdc import table_diff

    rng = _rng()

    def snap(seed_shift):
        out = {}
        for k in range(200):
            if rng.random() < 0.8:
                price = None if rng.random() < 0.1 else round(float(rng.uniform(1, 9)), 2)
                out[k] = (price, str(rng.integers(0, 3)))
        return out

    old, new = snap(0), snap(1)
    old_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in old.items()], "k long, price double, st string"
    )
    new_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in new.items()], "k long, price double, st string"
    )
    got = {(r.k, r.change) for r in table_diff(old_df, new_df, ["k"], ["price", "st"]).collect()}
    want = set()
    for k in old.keys() | new.keys():
        if k not in new:
            want.add((k, "D"))
        elif k not in old:
            want.add((k, "I"))
        elif old[k] != new[k]:
            want.add((k, "U"))
    assert got == want


@pytest.mark.parametrize("op", ["decayed_sum", "golden_record", "incremental_dedup"])
def test_partitioning_invariance(spark, op):
    """Same rows, 1 vs 32 partitions -> identical results (catches
    order-dependent accumulation and per-partition state leaks)."""
    rng = _rng()
    if op == "decayed_sum":
        from cosmos_xenna_spark.operators.timeseries import decayed_sum

        rows = [(int(i), int(i % 4), float(rng.uniform(0, 9))) for i in range(256)]
        df = spark.createDataFrame(rows, "event_id long, user_id long, value double")

        def run(frame):
            return sorted(
                map(
                    tuple,
                    decayed_sum(
                        frame.withColumn("ts", frame.event_id.cast("timestamp")),
                        ["user_id"], "ts", "value", 20, ["event_id"],
                    ).select("event_id", "decayed").collect(),
                )
            )
    elif op == "golden_record":
        from cosmos_xenna_spark.operators.dedup import golden_record

        rows = [
            (int(i), int(i % 7), f"t{int(rng.integers(0, 50))}", int(rng.integers(1, 99)))
            for i in range(256)
        ]
        df = spark.createDataFrame(rows, "doc_id long, cluster_id long, text string, score long")

        def run(frame):
            return sorted(
                map(
                    tuple,
                    golden_record(
                        frame, "cluster_id", {"text": "score"}, sum_cols=["score"]
                    ).collect(),
                )
            )
    else:
        from cosmos_xenna_spark.operators.dedup import incremental_fuzzy_dedup

        base = ["alpha beta gamma delta epsilon zeta " + str(i % 9) for i in range(64)]
        rows = [(i, base[i % len(base)]) for i in range(128)]
        new_rows = [(1000 + i, base[(i * 3) % len(base)] + (" x" if i % 2 else "")) for i in range(40)]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        batch = spark.createDataFrame(new_rows, "doc_id long, text string")

        def run(frame):
            return sorted(
                r.doc_id
                for r in incremental_fuzzy_dedup(frame, corpus, "text", threshold=0.5)
                .select("doc_id")
                .collect()
            )

        assert run(batch.repartition(1)) == run(batch.repartition(32))
        return
    assert run(df.repartition(1)) == run(df.repartition(32))
