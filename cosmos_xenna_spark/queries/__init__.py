"""Query registry: every operator the engine claims, with its oracle.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables.
The driver (and our pytest harness) executes both and compares
row-count + schema + order-insensitive value hash. Specs whose
semantics are not SQL-expressible (streaming state, LSH property
checks) set ``oracle=None`` and are covered by dedicated pytest
property tests instead.

Column names are aliased identically on both sides — the comparator
sorts columns by name before hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    description: str = ""


def register(name: str, oracle: str | None, description: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, description=description)
        return fn

    return deco


_MODULES = (
    "relational",
    "tpch_extra",
    "joins",
    "windows",
    "setops",
    "scalar",
    "events",
    "dedup",
    "similarity",
    "text",
    "stage_queries",
    "multimodal",
    "udfs",
    "skew",
    "sampling",
    "subqueries",
    "quality",
    "curation",
    "cdc",
    "retrieval",
    "stats",
    "dq",
    "bloom",
    "graph",
    "sharding",
    "timeseries",
    "basket",
    "spatial",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for m in _MODULES:
        importlib.import_module(f"cosmos_xenna_spark.queries.{m}")
    return REGISTRY
