"""SPMD barrier-stage tests (reference A8: coordinated worker groups
with rank/world-size, reference actor_pool.py:1649-1655)."""

from __future__ import annotations

import sys

import pandas as pd
from pyspark import cloudpickle

from cosmos_xenna_spark.operators.spmd import SpmdContext, apply_spmd_stage

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def test_spmd_ranks_and_rendezvous(spark):
    df = spark.range(40).selectExpr("id")

    def fn(ctx: SpmdContext, batches):
        total = sum(len(p) for p in batches)
        yield pd.DataFrame(
            {
                "rank": [ctx.rank],
                "world_size": [ctx.world_size],
                "n_rows": [total],
                "has_master": [bool(ctx.master_addr)],
            }
        )

    out = apply_spmd_stage(
        df, fn, "rank int, world_size int, n_rows long, has_master boolean", world_size=4
    ).collect()
    assert sorted(r.rank for r in out) == [0, 1, 2, 3]
    assert all(r.world_size == 4 for r in out)
    assert sum(r.n_rows for r in out) == 40
    assert all(r.has_master for r in out)


def test_spmd_rank0_only_emission(spark):
    """Reference keeps rank-0 results only (actor_pool.py:2081-2110);
    non-contributing ranks yield nothing."""
    df = spark.range(12).selectExpr("id")

    def fn(ctx: SpmdContext, batches):
        n = sum(len(p) for p in batches)
        if ctx.rank == 0:
            yield pd.DataFrame({"world_total_seen_by_rank0": [n]})

    out = apply_spmd_stage(
        df, fn, "world_total_seen_by_rank0 long", world_size=3
    ).collect()
    assert len(out) == 1
