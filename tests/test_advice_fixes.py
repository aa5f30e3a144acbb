"""Regression tests for round-1 advisor findings.

- node-setup failure must not wedge waiters (failure marker + re-election)
- global_row_number must match nulls-first window semantics on NULL keys
- cluster_centroids must fail loudly on empty / ragged inputs
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.ranking import global_row_number
from cosmos_xenna_spark.operators.similarity import cluster_centroids
from cosmos_xenna_spark.operators.stage import Stage, _node_setup_once


class _FailingSetup(Stage):
    def setup_on_node(self) -> None:
        raise RuntimeError("boom: node setup failed")

    def process_data(self, batch):  # pragma: no cover - never called
        return batch


class _OkSetup(Stage):
    def setup_on_node(self) -> None:
        pass

    def process_data(self, batch):  # pragma: no cover - never called
        return batch


def test_node_setup_failure_records_marker_and_reelects(tmp_path):
    run_id = uuid.uuid4().hex
    import tempfile

    marker = os.path.join(tempfile.gettempdir(), f"cxs_node_setup_{run_id}")
    with pytest.raises(RuntimeError, match="boom"):
        _node_setup_once(_FailingSetup(), run_id)
    # failure marker recorded, lock released, no done marker
    assert os.path.exists(marker + ".failed")
    assert not os.path.exists(marker + ".lock")
    assert not os.path.exists(marker)
    # a retried task re-runs setup and clears the failure record
    _node_setup_once(_OkSetup(), run_id)
    assert os.path.exists(marker)
    assert not os.path.exists(marker + ".failed")
    for suffix in ("", ".failed", ".lock"):
        if os.path.exists(marker + suffix):
            os.unlink(marker + suffix)


def test_node_setup_waiter_sees_failure(tmp_path):
    """A process that lost the election must raise when the elected
    process recorded a failure, not spin forever."""
    run_id = uuid.uuid4().hex
    import tempfile

    marker = os.path.join(tempfile.gettempdir(), f"cxs_node_setup_{run_id}")
    # simulate: election lock held by someone, failure already recorded
    with open(marker + ".lock", "w"):
        pass
    with open(marker + ".failed", "w") as f:
        f.write("RuntimeError('boom')")
    with pytest.raises(RuntimeError, match="setup_on_node failed"):
        _node_setup_once(_OkSetup(), run_id)
    for suffix in (".failed", ".lock"):
        os.unlink(marker + suffix)


def test_global_row_number_null_keys_rank_first(spark):
    rows = [(None, 1), (5.0, 2), (None, 3), (1.0, 4), (3.0, 5)]
    df = spark.createDataFrame(rows, "key double, id long")
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, ["key", "id"], num_buckets=2).collect()
    }
    w = Window.orderBy(F.asc("key"), F.asc("id"))  # Spark: nulls first
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_cluster_centroids_empty_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, label int, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        cluster_centroids(empty)


def test_cluster_centroids_ragged_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, [1.0, 2.0]), (2, 0, [1.0, 2.0, 3.0])],
        "vec_id long, label int, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        cluster_centroids(df)
