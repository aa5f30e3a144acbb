"""Skew mitigation: salting for hot keys (SURVEY.md §2.B scale path).

AQE's skew-join handling splits oversized partitions at runtime; these
operators are the *planned* form for when the skew is known (a handful
of hot keys owning a large fraction of rows — the Zipfian reality of
100 TB user/event data):

- ``salted_agg``: two-phase aggregation. Phase 1 groups by
  (key, salt) — the hot key's rows spread over ``n_salt`` reducers —
  phase 2 re-aggregates the per-salt partials. Exact for decomposable
  aggregates (sum/count/min/max).
- ``salted_join``: replicate the small side ``n_salt`` times, salt the
  big side deterministically, equi-join on (key, salt). The hot key's
  probe rows spread over ``n_salt`` tasks instead of one.

Salts are hash-derived (xxhash64 of a row-unique column), not rand():
results stay deterministic and replayable — a retried task recomputes
the same salt (rand() would silently break exactly-once semantics on
retry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(unique_col: str | Column, n_salt: int) -> Column:
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salt)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    unique_col: str,
    n_salt: int = 16,
    sums: list[str] | None = None,
    count_alias: str | None = "n",
) -> DataFrame:
    """Two-phase skew-safe aggregation: per-key sums/count, exact.

    Phase 1 shuffles on (keys..., salt); phase 2 shuffles the tiny
    per-salt partials on keys. Output columns: keys..., `sum_<col>`
    per requested sum, and ``count_alias`` for the row count.
    """
    sums = sums or []
    salted = df.withColumn("__salt", _salt(unique_col, n_salt))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in sums],
    )
    aggs = [F.sum("__n").alias(count_alias)] if count_alias else []
    aggs += [F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sums]
    return phase1.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Skew-safe inner equi-join: salt the big side, replicate the
    small side across all salt values, join on (key, salt).

    Exact same rows as ``big.join(small, key)``; the extra ``explode``
    costs ``n_salt × |small|`` rows — the trade that makes the hot
    key's probe side parallel.
    """
    b = big.withColumn("__salt", _salt(unique_col, n_salt))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return b.join(s, [key, "__salt"]).drop("__salt")
