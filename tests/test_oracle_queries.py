"""Differential test: every registered query with an oracle must
hash-match DuckDB on the same parquet tables (driver-gate mirror)."""

from __future__ import annotations

import pytest

from cosmos_xenna_spark.oracle import compare
from cosmos_xenna_spark.queries import load_registry

REGISTRY = load_registry()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
NO_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    res = compare(name, df, spec.oracle, duck)
    assert res.ok, (
        f"{name}: rows {res.n_spark} vs {res.n_oracle}; "
        f"cols {res.cols_spark} vs {res.cols_oracle}; "
        f"hash {res.hash_spark[:12]} vs {res.hash_oracle[:12]}; "
        f"sample diffs: {res.first_diffs}"
    )


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(name, spark, sf_dir):
    """Oracle-less queries must at least execute with a stable schema."""
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    assert df.columns
    assert df.count() >= 0
