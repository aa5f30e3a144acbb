"""Plan inspection utilities: assert the physical plan is the one you'd
want at 100 TB (filter pushdown reached the scan, dims broadcast,
whole-stage codegen covers the hot path).

Used by tests/test_plans.py to regression-guard plan quality — a query
that silently regresses from broadcast to sort-merge or loses pushdown
fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_NODE_HEADER = re.compile(r"^\((\d+)\) (\S+)", re.MULTILINE)


def plan_nodes(df: DataFrame) -> list[str]:
    """Operator names from the formatted plan's detail section (each
    node exactly once — the tree rendering would double-count)."""
    return [m.group(2) for m in _NODE_HEADER.finditer(physical_plan(df))]


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names that actually reach the parquet scan (pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(part.split(":")[0] for part in inner.split(",") if part)
    return cols


def count_broadcast_joins(df: DataFrame) -> int:
    return sum(1 for n in plan_nodes(df) if n == "BroadcastHashJoin")


def count_sort_merge_joins(df: DataFrame) -> int:
    return sum(1 for n in plan_nodes(df) if n == "SortMergeJoin")


def count_broadcast_exchanges(df: DataFrame) -> int:
    return sum(1 for n in plan_nodes(df) if n == "BroadcastExchange")


def count_shuffles(df: DataFrame) -> int:
    """Shuffle Exchange operators (BroadcastExchange is not a shuffle;
    AQE may later coalesce the ones counted here)."""
    return sum(1 for n in plan_nodes(df) if n == "Exchange")


def uses_whole_stage_codegen(df: DataFrame) -> bool:
    """Codegen markers only appear once AQE finalizes; run a cheap
    action first when asserting this on an adaptive plan."""
    return "WholeStageCodegen" in physical_plan(df) or "codegen id" in physical_plan(df)
