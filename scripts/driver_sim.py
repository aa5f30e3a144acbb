#!/usr/bin/env python
"""Local mirror of the correctness driver: run the first N surfaced
queries from ``__spark_entry__.queries()`` against their DuckDB oracle
SQL at a given sf dir and report per-query row/schema/hash matches.

Usage: python scripts/driver_sim.py [sf_dir] [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import __spark_entry__ as entry_mod  # noqa: E402
from cosmos_xenna_spark.oracle import compare, make_duckdb  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    window = list(queries)[:n]

    spark = get_spark(app_name="driver_sim")
    con = make_duckdb(sf_dir)

    results: dict[str, dict] = {}
    n_ok = 0
    for name in window:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                res = compare(name, df, oracles[name], con)
                ok = res.ok
                results[name] = {
                    "rows_match": res.n_spark == res.n_oracle,
                    "schema_match": res.cols_spark == res.cols_oracle,
                    "hash_match": res.hash_spark == res.hash_oracle,
                    "sec": round(time.perf_counter() - t0, 2),
                }
                if not ok:
                    results[name]["detail"] = {
                        "rows": [res.n_spark, res.n_oracle],
                        "cols": [res.cols_spark, res.cols_oracle],
                        "diffs": res.first_diffs,
                    }
            else:
                rows = df.count()
                ok = rows >= 0
                results[name] = {"rows_only": rows, "sec": round(time.perf_counter() - t0, 2)}
        except Exception as exc:  # noqa: BLE001
            ok = False
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:400]}
        n_ok += ok
        print(f"{'OK ' if ok else 'FAIL'} {name} {results[name].get('sec', '-')}s", flush=True)

    print(json.dumps({"green": n_ok, "total": len(window)}))
    with open(os.path.join(HERE, "DRIVER_SIM.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "green": n_ok, "total": len(window), "results": results}, f, indent=1)
    spark.stop()
    sys.exit(0 if n_ok == len(window) else 1)


if __name__ == "__main__":
    main()
