"""Targeted oracle check: verify named registry queries against DuckDB
at one or more scale factors (rows+schema+hash, the driver_sim recipe).

Usage: python scripts/r12_verify_queries.py <sf_dir[,sf_dir...]> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from cosmos_xenna_spark.oracle import compare, make_duckdb  # noqa: E402
from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dirs = sys.argv[1].split(",")
    names = sys.argv[2:]
    spark = get_spark(app_name="r12_verify")
    reg = load_registry()
    bad = 0
    for sf_dir in sf_dirs:
        con = make_duckdb(sf_dir)
        for name in names:
            spec = reg[name]
            t0 = time.perf_counter()
            if spec.oracle is None:
                rows = spec.builder(spark, sf_dir).count()
                print(f"{sf_dir} {name}: rows_only={rows}")
                continue
            res = compare(name, spec.builder(spark, sf_dir), spec.oracle, con)
            ok = res.ok
            dt = time.perf_counter() - t0
            print(f"{sf_dir} {name}: {'OK' if ok else 'MISMATCH'} ({dt:.1f}s)", flush=True)
            if not ok:
                bad += 1
                print(f"  rows: {res.n_spark} vs {res.n_oracle}")
                print(f"  cols: {res.cols_spark} vs {res.cols_oracle}")
                print(f"  diffs: {res.first_diffs}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
