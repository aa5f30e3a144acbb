"""Continuous (asyncio) stage adapter tests (reference A9 parity)."""

from __future__ import annotations

import sys

import pandas as pd
import pytest
from pyspark import cloudpickle

from cosmos_xenna_spark.operators.continuous import (
    ContinuousStage,
    apply_continuous_stage,
)

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class Doubler(ContinuousStage):
    """Async stage: doubles x, emits a summary row after the sentinel
    (dynamic fan-in — outputs decouple from input batches)."""

    async def run_continuous(self, input_q, output_q) -> None:
        total = 0
        while True:
            pdf = await input_q.get()
            if pdf is None:
                break
            total += int(pdf["x"].sum())
            await output_q.put(pd.DataFrame({"x": pdf["x"] * 2, "kind": "row"}))
        await output_q.put(pd.DataFrame({"x": [total], "kind": ["sum"]}))
        await output_q.put(None)


class Exploder(ContinuousStage):
    async def run_continuous(self, input_q, output_q) -> None:
        while True:
            pdf = await input_q.get()
            if pdf is None:
                break
            raise ValueError("boom")


def test_continuous_stage_transform_and_fanin(spark):
    src = spark.range(100).selectExpr("id AS x").repartition(4)
    out = apply_continuous_stage(src, Doubler, "x long, kind string")
    rows = out.collect()
    doubled = sorted(r.x for r in rows if r.kind == "row")
    sums = [r.x for r in rows if r.kind == "sum"]
    assert doubled == sorted(x * 2 for x in range(100))
    assert len(sums) == 4  # one summary per partition
    assert sum(sums) == sum(range(100))


def test_continuous_stage_error_propagates(spark):
    src = spark.range(10).selectExpr("id AS x")
    out = apply_continuous_stage(src, Exploder, "x long, kind string")
    with pytest.raises(Exception, match="boom"):
        out.collect()
