"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry of
``cosmos_xenna_spark.queries`` — one entry per implemented operator
from SURVEY.md §2.B, each paired with the DuckDB-runnable ANSI SQL the
driver compares against.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    reg = load_registry()
    return reg["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = load_registry()

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return spec.builder(spark, sf_dir)

        run.__name__ = spec.name
        return run

    return {name: wrap(spec) for name, spec in sorted(reg.items())}


def oracle_sql() -> dict[str, str]:
    reg = load_registry()
    return {name: spec.oracle for name, spec in sorted(reg.items()) if spec.oracle is not None}
