"""DuckDB differential oracle (mirrors the driver's correctness gate).

Runs a Spark DataFrame and the equivalent DuckDB SQL over the same
parquet tables and compares row count, column names, and an
order-insensitive canonical value hash. Queries are written so values
match *exactly* (decimal-exact aggregation, deterministic tiebreaks) —
no tolerance is applied here.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
from dataclasses import dataclass
from decimal import Decimal

import duckdb

from cosmos_xenna_spark.catalog import TABLES


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single parquet FILES; derived corpora
        # (scripts/gen_sf1.py) are Spark-written DIRECTORIES of part
        # files — glob those so either layout oracles identically.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    """Sort columns by name, canonicalize every value, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols_sorted = [columns[i] for i in order]
    out = sorted("\x1f".join(_canon(row[i]) for i in order) for row in rows)
    return cols_sorted, out


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    cols, lines = canonical_rows(columns, rows)
    h = hashlib.md5()
    h.update(("\x1e".join(cols)).encode())
    for line in lines:
        h.update(b"\x1d")
        h.update(line.encode())
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    n_spark: int
    n_oracle: int
    cols_spark: list[str]
    cols_oracle: list[str]
    hash_spark: str
    hash_oracle: str
    first_diffs: list[tuple[str, str]]

    @property
    def ok(self) -> bool:
        return (
            self.n_spark == self.n_oracle
            and self.cols_spark == self.cols_oracle
            and self.hash_spark == self.hash_oracle
        )


def compare(name: str, spark_df, oracle_sql: str, con: duckdb.DuckDBPyConnection) -> CompareResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    sc, s_lines = canonical_rows(s_cols, s_rows)
    oc, o_lines = canonical_rows(o_cols, o_rows)
    diffs: list[tuple[str, str]] = []
    if s_lines != o_lines:
        sset, oset = set(s_lines), set(o_lines)
        only_s = sorted(sset - oset)[:3]
        only_o = sorted(oset - sset)[:3]
        diffs = [("spark", x) for x in only_s] + [("oracle", x) for x in only_o]
    return CompareResult(
        name=name,
        n_spark=len(s_rows),
        n_oracle=len(o_rows),
        cols_spark=sc,
        cols_oracle=oc,
        hash_spark=value_hash(s_cols, s_rows),
        hash_oracle=value_hash(o_cols, o_rows),
        first_diffs=diffs,
    )
