"""Column-expression helpers shared by queries and operators.

The central trick: **decimal-exact aggregation**. Double-precision sums
depend on partition/accumulation order, so a Spark sum and a DuckDB sum
of the same doubles can differ in the last bits — fatal for value-hash
oracle comparison. Casting inputs to DECIMAL first makes every partial
sum exact and order-independent; casting the exact decimal result back
to DOUBLE is deterministic (round-to-nearest of the same rational), so
both engines produce bit-identical doubles. This costs nothing at
scale — decimal sums still get map-side partial aggregation.

``md5_long63`` gives a cross-engine deterministic 63-bit hash (Spark's
xxhash64 and DuckDB's hash() are different algorithms; md5 is the
portable common denominator; use xxhash64 in pure-Spark hot paths).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: Column | str, typ: str = DEC) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column | str, typ: str = DEC) -> Column:
    """Order-independent exact sum, returned as double."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col: Column | str, typ: str = DEC) -> Column:
    """Deterministic average: exact decimal sum / exact count."""
    return (F.sum(dec(col, typ)).cast("double") / F.count(dec(col, typ))).cast("double")


def dstddev_samp(col: Column | str) -> Column:
    """Deterministic sample stddev from exact decimal sums.

    stddev = sqrt((sum(x^2) - sum(x)^2/n) / (n-1)), all sums decimal-
    exact then cast to double; sqrt is IEEE-correctly-rounded so both
    engines agree bit-for-bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    x = c.cast("decimal(18,4)")
    sx = F.sum(x).cast("double")
    sxx = F.sum((x * x).cast("decimal(38,8)")).cast("double")
    n = F.count(x).cast("double")
    return F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0)))


def md5_long63(col: Column | str, prefix: str = "") -> Column:
    """Deterministic non-negative 63-bit hash reproducible in DuckDB.

    DuckDB equivalent: ``CAST(CONCAT('0x', substr(md5(<expr>), 1, 15))
    AS BIGINT)`` (15 hex digits = 60 bits, always < 2^63).
    """
    c = F.col(col) if isinstance(col, str) else col
    if prefix:
        c = F.concat(F.lit(prefix), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_long63_sql(expr: str, prefix: str = "") -> str:
    """The DuckDB SQL mirror of :func:`md5_long63`."""
    inner = f"concat('{prefix}', {expr})" if prefix else expr
    return f"CAST(CONCAT('0x', substr(md5({inner}), 1, 15)) AS BIGINT)"


def revenue_col() -> Column:
    """Exact lineitem revenue: price * (1 - discount), decimal throughout.

    Every factor is cast to decimal *before* multiplying — computing the
    product in double first and casting the result is NOT exact (the
    per-op double rounding can land the product off the decimal grid).
    """
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


REVENUE_SQL = "(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))"


def charge_col() -> Column:
    return revenue_col() * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))


CHARGE_SQL = f"({REVENUE_SQL} * (1 + CAST(l_tax AS DECIMAL(4,2))))"


# SQL-side mirrors (DuckDB dialect) of the decimal-exact helpers.
#
# Decimal results convert to DOUBLE via a VARCHAR round-trip: DuckDB's
# direct DECIMAL->DOUBLE cast divides the (possibly int128) unscaled
# value by 10^scale in floating point — two roundings, up to 1 ulp off
# for sums whose unscaled value exceeds 2^53 — while Spark's
# BigDecimal conversion (and strtod parsing, in both engines) is
# correctly rounded.
def _d2d_sql(expr: str) -> str:
    return f"CAST(CAST({expr} AS STRING) AS DOUBLE)"


def dsum_sql(expr: str, typ: str = "DECIMAL(18,2)") -> str:
    return _d2d_sql(f"SUM(CAST({expr} AS {typ}))")


def davg_sql(expr: str, typ: str = "DECIMAL(18,2)") -> str:
    return (
        f"CAST({_d2d_sql(f'SUM(CAST({expr} AS {typ}))')}"
        f" / COUNT(CAST({expr} AS {typ})) AS DOUBLE)"
    )


def dstddev_samp_sql(expr: str) -> str:
    x = f"CAST({expr} AS DECIMAL(18,4))"
    sx = _d2d_sql(f"SUM({x})")
    sxx = _d2d_sql(f"SUM(CAST(({x} * {x}) AS DECIMAL(38,8)))")
    n = f"CAST(COUNT({x}) AS DOUBLE)"
    return f"sqrt(({sxx} - {sx} * {sx} / {n}) / ({n} - 1.0))"
