"""Registry-wide output-type audit (driver-harness safety).

The driver canonicalizes both result frames to pandas and hashes them
with dtype-sensitive hashing; it also sorts cell values. That makes two
classes of output dangerous for EVERY registered query:

  1. array/map/struct typed columns — pandas can't sort ndarray cells
     (TypeError: unhashable type 'numpy.ndarray');
  2. int32/int16/int8 Spark columns where the DuckDB oracle yields
     int64 (DuckDB len()/strpos()/CASE arithmetic are BIGINT) — rows
     and schema match but the dtype-sensitive hash doesn't.

This script runs every registered query at sf0.001 on BOTH engines and
prints any complex-typed Spark output, any sub-64-bit integer column on
either side, and any Spark-vs-oracle pandas dtype mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from cosmos_xenna_spark.queries import load_registry  # noqa: E402
from cosmos_xenna_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.001")
BAD_SPARK_TYPES = ("array<", "map<", "struct<")
SMALL_INTS = ("int", "smallint", "tinyint", "short", "byte")


def main() -> int:
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    reg = load_registry()
    only = set(sys.argv[1:])
    problems = 0
    for name, spec in sorted(reg.items()):
        if only and name not in only:
            continue
        try:
            df = spec.builder(spark, SF_DIR)
            spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        except Exception as e:  # noqa: BLE001
            problems += 1
            print(f"{name}: SPARK BUILD ERROR: {e}")
            continue
        for col, typ in spark_types.items():
            if typ.startswith(BAD_SPARK_TYPES):
                problems += 1
                print(f"{name}: COMPLEX spark output {col}: {typ}")
            if typ in SMALL_INTS:
                problems += 1
                print(f"{name}: INT32-ish spark output {col}: {typ}")
        if spec.oracle is None:
            continue
        try:
            opdf = con.execute(spec.oracle).fetch_df()
        except Exception as e:  # noqa: BLE001
            problems += 1
            print(f"{name}: ORACLE ERROR: {type(e).__name__}: {e}")
            continue
        spdf = df.toPandas()
        sp_d = {c: str(d) for c, d in spdf.dtypes.items()}
        or_d = {c: str(d) for c, d in opdf.dtypes.items()}
        if set(sp_d) != set(or_d):
            problems += 1
            print(f"{name}: COLUMN MISMATCH spark={sorted(sp_d)} oracle={sorted(or_d)}")
            continue
        for c in sp_d:
            a, b = sp_d[c], or_d[c]
            if a != b:
                # nullable int64 vs float64 from NULLs is a pandas
                # artifact both harnesses hit identically only if the
                # NULL pattern matches; flag every divergence.
                problems += 1
                print(f"{name}: DTYPE MISMATCH {c}: spark={a} oracle={b}")
    print(f"---\n{problems} problems")
    return 0 if problems == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
