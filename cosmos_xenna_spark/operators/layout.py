"""Multi-dimensional data layout: Z-order (Morton) keys for
file-skipping — the engine-level form of a lakehouse ``OPTIMIZE
ZORDER BY`` (Delta/Iceberg publish the same technique; the math is the
classic Morton interleave).

Why it matters at 100 TB: a table range-partitioned on ONE column
prunes scans only for predicates on that column.  Interleaving the
bits of several columns into one sort key makes every file a small
hyper-rectangle in all of them, so min/max row-group statistics prune
scans for predicates on ANY interleaved column.  The key is a flat
integer expression (shift/mask/or), identical in any engine —
oracle-able and pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column into one
    BIGINT sort key (supports 2..4 columns, ``bits * n_cols <= 62``).

    Columns must be non-negative integers in [0, 2^bits); values are
    masked to the low bits (callers normalize first — e.g. days since
    epoch, bucketed prices).  Flat shift/or expression: whole-stage
    codegen, no UDF, bit-identical across engines.
    """
    n = len(cols)
    if not 2 <= n <= 4:
        raise ValueError(f"zorder_key interleaves 2..4 columns, got {n}")
    if bits * n > 62:
        raise ValueError(f"bits * n_cols must fit a BIGINT ({bits}*{n} > 62)")
    terms = []
    for b in range(bits):
        for ci, c in enumerate(cols):
            terms.append(f"((({c} >> {b}) & 1) << {b * n + ci})")
    return F.expr(" + ".join(terms)).cast("bigint")


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    n = len(cols)
    terms = []
    for b in range(bits):
        for ci, c in enumerate(cols):
            terms.append(f"((({c} >> {b}) & 1) << {b * n + ci})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def layout_by_zorder(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 16
) -> DataFrame:
    """Re-layout a table for multi-dimensional skipping: range-partition
    by the Morton key into ``n_files`` partitions and sort within each
    — every output file becomes a small hyper-rectangle in ALL of
    ``cols``, so row-group min/max stats prune scans on any of them.

    One range-exchange (sampled boundaries) + partition-local sort —
    exactly the cost of a single-column layout, with skipping on every
    interleaved dimension instead of one.
    """
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
