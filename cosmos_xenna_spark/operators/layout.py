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


def hilbert_key_sql(
    table_sql: str, id_cols: list[str], x_sql: str, y_sql: str, bits: int = 8
) -> str:
    """Shared SQL for the 2-D Hilbert index — identical text runs on
    both engines. The classic xy2d loop (rx/ry bit tests, quadrant
    ``(3*rx) XOR ry``, conditional reflect+swap) is unrolled into
    ``bits`` nested selects; XOR and the branchy rotation are rewritten
    as portable arithmetic/CASE:

    - ``(3*rx) XOR ry  ==  3*rx + ry - 2*rx*ry``  (rx, ry in {0,1})
    - rotate: ry=1 -> identity; ry=0, rx=0 -> swap;
      ry=0, rx=1 -> (n-1-y, n-1-x)

    Values are masked to the low ``bits`` (callers normalize like
    zorder_key). Flat integer expressions: whole-stage codegen, no
    UDF, bit-identical across engines.
    """
    if not 1 <= bits <= 15:
        raise ValueError(f"bits must be 1..15, got {bits}")
    n = 1 << bits
    ids = ", ".join(id_cols)
    sql = f"""
      SELECT {ids}, CAST(({x_sql}) & {n - 1} AS BIGINT) AS __hcx,
             CAST(({y_sql}) & {n - 1} AS BIGINT) AS __hcy,
             CAST(0 AS BIGINT) AS __hd
      FROM ({table_sql})
    """
    for t in range(bits):
        s = 1 << (bits - 1 - t)
        sql = f"""
      SELECT {ids},
             __hd + {s * s} * (3 * __hrx + __hry - 2 * __hrx * __hry) AS __hd,
             CASE WHEN __hry = 1 THEN __hcx
                  WHEN __hrx = 0 THEN __hcy
                  ELSE {n - 1} - __hcy END AS __hcx,
             CASE WHEN __hry = 1 THEN __hcy
                  WHEN __hrx = 0 THEN __hcx
                  ELSE {n - 1} - __hcx END AS __hcy
      FROM (
        SELECT {ids}, __hcx, __hcy, __hd,
               CASE WHEN (__hcx & {s}) > 0 THEN 1 ELSE 0 END AS __hrx,
               CASE WHEN (__hcy & {s}) > 0 THEN 1 ELSE 0 END AS __hry
        FROM ({sql})
      )
    """
    return f"SELECT {ids}, CAST(__hd AS BIGINT) AS hkey FROM ({sql})"


def hilbert_key(
    df: DataFrame,
    id_cols: list[str],
    x_sql: str,
    y_sql: str,
    bits: int = 8,
    view_name: str = "__hilbert",
) -> DataFrame:
    """2-D Hilbert layout key (the locality-optimal alternative to
    :func:`zorder_key`): consecutive key values are ALWAYS adjacent
    cells, so a range of the key covers a more compact rectangle than
    Morton order — measurably fewer files touched per 2-D range
    predicate at the same file count (no Morton "jumps" across the
    space). Same contract as zorder: normalize both dimensions to
    [0, 2^bits) integers first, then ORDER BY / range-partition on
    ``hkey`` for min/max-prunable files on both columns.
    """
    df.createOrReplaceTempView(view_name)
    return df.sparkSession.sql(
        hilbert_key_sql(f"SELECT * FROM {view_name}", id_cols, x_sql, y_sql, bits)
    )


def layout_skipping_eval_sql(
    table_sql: str,
    x_sql: str,
    y_sql: str,
    bits: int = 8,
    n_files: int = 64,
    rect: tuple[int, int, int, int] = (32, 95, 64, 127),
) -> str:
    """Shared SQL comparing Hilbert vs Morton file-skipping on the SAME
    rows: key both ways, split each ordering into ``n_files``
    equal-width key ranges (the file layout a range-partitioned write
    produces), collect per-file min/max stats for both dimensions, and
    count the files a rectangle predicate would touch under standard
    min/max pruning — plus the rows those files scan vs the rows that
    actually match.  The quantified form of the Hilbert locality claim:
    consecutive keys are adjacent cells, so equal key ranges cover
    tighter rectangles and prune more files.
    """
    x0, x1, y0, y1 = rect
    width = (1 << (2 * bits)) // n_files
    zexpr = zorder_key_sql(["hx", "hy"], bits)
    hil = hilbert_key_sql(
        f"SELECT ({x_sql}) AS hx, ({y_sql}) AS hy FROM ({table_sql})",
        ["hx", "hy"],
        "hx",
        "hy",
        bits,
    )
    return f"""
    WITH keyed AS (
      SELECT hx, hy, hkey, {zexpr} AS zkey FROM ({hil})
    ),
    layouts AS (
      SELECT 'hilbert' AS layout,
             CAST(FLOOR(hkey / {width}.0) AS BIGINT) AS f, hx, hy FROM keyed
      UNION ALL
      SELECT 'zorder',
             CAST(FLOOR(zkey / {width}.0) AS BIGINT), hx, hy FROM keyed
    ),
    files AS (
      SELECT layout, f, CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(hx) AS x_min, MAX(hx) AS x_max,
             MIN(hy) AS y_min, MAX(hy) AS y_max,
             CAST(SUM(CASE WHEN hx BETWEEN {x0} AND {x1}
                            AND hy BETWEEN {y0} AND {y1}
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_match
      FROM layouts GROUP BY layout, f
    ),
    flagged AS (
      SELECT *, CASE WHEN x_min <= {x1} AND x_max >= {x0}
                      AND y_min <= {y1} AND y_max >= {y0}
                     THEN 1 ELSE 0 END AS touched
      FROM files
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(touched) AS BIGINT) AS files_touched,
           CAST(SUM(CASE WHEN touched = 1 THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matched
    FROM flagged GROUP BY layout
    """


def layout_skipping_eval(
    df: DataFrame,
    x_sql: str,
    y_sql: str,
    bits: int = 8,
    n_files: int = 64,
    rect: tuple[int, int, int, int] = (32, 95, 64, 127),
    view_name: str = "__layout_eval",
) -> DataFrame:
    """See :func:`layout_skipping_eval_sql` — one scan, one (layout,
    file) aggregation (2 * n_files groups), one 2-row rollup; the
    whole evaluation is metadata-scale after the first aggregate."""
    df.createOrReplaceTempView(view_name)
    return df.sparkSession.sql(
        layout_skipping_eval_sql(
            f"SELECT * FROM {view_name}", x_sql, y_sql, bits, n_files, rect
        )
    )
