"""SPMD (barrier-mode) stages: reference A8 parity.

The reference broadcasts one task to every rank of a worker group and
keeps only rank-0's result (``cosmos_xenna/ray_utils/
actor_pool.py:1649-1655`` broadcast, ``:1698-1699``/``:2081-2110``
rank-0 filter), exposing RANK / WORLD_SIZE / MASTER_ADDR env vars
(``resources.py:312-359``) for NCCL-style rendezvous.

Spark-first mapping: barrier execution mode — ``rdd.barrier()
.mapPartitions`` with ``BarrierTaskContext`` supplying rank, world
size, and the rank-0 address for rendezvous. Constraints documented
rather than fought (SURVEY.md §7 M5): a barrier stage needs
slots >= world_size and no dynamic allocation on that stage.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class SpmdContext:
    """What the reference exposes through env vars
    (``resources.py:312-359``): rank, world size, master address."""

    rank: int
    world_size: int
    master_addr: str


def apply_spmd_stage(
    df: DataFrame,
    fn: Callable[[SpmdContext, Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    output_schema: str | StructType,
    world_size: int,
) -> DataFrame:
    """Run ``fn`` as a coordinated SPMD group of ``world_size`` ranks.

    Every rank sees its own partition of rows; ``fn`` may use
    ``ctx.master_addr`` for rendezvous (torch.distributed etc.).
    Mirrors reference semantics where each rank computes and the engine
    keeps all emitted rows — a rank that should not contribute (the
    reference keeps rank-0 only, ``actor_pool.py:2081-2110``) simply
    yields nothing.
    """
    def runner(batches):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        infos = ctx.getTaskInfos()
        sctx = SpmdContext(
            rank=ctx.partitionId(),
            world_size=len(infos),
            master_addr=infos[0].address.split(":")[0],
        )
        ctx.barrier()  # rendezvous: all ranks alive before user code
        yield from fn(sctx, batches)

    # barrier-mode mapInPandas keeps the whole path on Arrow batches
    # (no row-tuple conversion) while BarrierTaskContext supplies the
    # rank/world/rendezvous the reference exposes via env vars.
    return df.repartition(world_size).mapInPandas(
        runner, schema=output_schema, barrier=True
    )
