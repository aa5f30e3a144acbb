"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is seed-deterministic only for a FIXED partitioning —
re-reading the same table with different split sizes (or after a
repartition) changes which rows survive, which poisons reproducibility
and makes cross-engine verification impossible. Every operator here
derives the sampling decision from a row-local portable hash
(``md5_long63``) of a stable key column, so:

- the sample is identical across runs, partitionings, and engines
  (the DuckDB oracle reproduces it bit-for-bit);
- sampling is a narrow operation — a filter on a row-local expression,
  zero shuffles, fully pushdown-friendly;
- at 100 TB the decision never needs a global pass (except the
  fixed-size variant, which does one distributed top-k by hash rank).

Reference parity: the reference has no sampling operators (its
pipelines sample by slicing input task lists driver-side, e.g.
``pipelines.py``'s input truncation); these are north-star additions
a data curation pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cosmos_xenna_spark.functions import md5_long63

# hash buckets for rate arithmetic: rate 0.2 keeps h % DENOM < 0.2*DENOM
_DENOM = 1_000_000


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = "sample:"
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction: rows whose salted key
    hash lands below the rate cutoff. Row-local filter, no shuffle."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    cut = int(rate * _DENOM)
    h = md5_long63(F.col(key_col).cast("string"), salt) % _DENOM
    return df.filter(h < cut)


def stratified_sample(
    df: DataFrame, rates: dict[str, float], strata_col: str, key_col: str,
    salt: str = "strata:",
) -> DataFrame:
    """Per-stratum deterministic rates (``sampleBy`` made reproducible).

    ``rates`` maps stratum value -> keep fraction; unlisted strata are
    dropped (matching ``DataFrame.sampleBy`` semantics). Still a pure
    row-local filter: the stratum's cutoff is looked up from a literal
    map, the hash decides.
    """
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0,1], got {v}")
    cut_map = F.create_map(
        *[
            c
            for k, v in sorted(rates.items())
            for c in (F.lit(k), F.lit(int(v * _DENOM)).cast("bigint"))
        ]
    )
    h = md5_long63(F.col(key_col).cast("string"), salt) % _DENOM
    cut = F.element_at(cut_map, F.col(strata_col).cast("string"))
    return df.filter(cut.isNotNull() & (h < cut))


def fixed_size_sample(
    df: DataFrame, n: int, key_col: str, salt: str = "fixed:"
) -> DataFrame:
    """Exactly ``min(n, count)`` rows, chosen as the n smallest salted
    key hashes — the deterministic replacement for reservoir sampling.

    Distributed shape: per-partition top-n (map-side, via sort within
    partitions + limit pushdown in TakeOrderedAndProject), then a
    single reduced top-n — Spark compiles the orderBy+limit to exactly
    that; no full sort, no single-partition shuffle of the data.
    """
    h = md5_long63(F.col(key_col).cast("string"), salt)
    return (
        df.withColumn("__h", h)
        .orderBy(F.asc("__h"), F.asc(key_col))
        .limit(n)
        .drop("__h")
    )


def split_weighted(
    df: DataFrame, weights: dict[str, float], key_col: str, salt: str = "split:",
    out_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by weighted deterministic hash
    (generalizes the 80/10/10 ``deterministic_split`` in operators.text
    to arbitrary named weights; weights must sum to ~1)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    h = md5_long63(F.col(key_col).cast("string"), salt) % _DENOM
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = h < int(acc * _DENOM)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def mixture_rebalance(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weights: dict[str, float] | None = None,
    total: float | None = None,
    salt: str = "mix:",
) -> DataFrame:
    """Deterministically downsample each stratum toward a target
    mixture — the "data mixing" step of a training-data pipeline
    (e.g. rebalance a source-skewed crawl to uniform-per-source, or to
    any published mixture of weights).

    ``weights`` maps stratum -> target share (need not sum to 1; shares
    are relative). ``None`` means uniform over the observed strata.
    ``total`` is the target output size; by default the largest total
    achievable WITHOUT upsampling any stratum: min over strata of
    n_s / w_s. Each stratum then keeps ``min(1, total * w_s / n_s)`` of
    its rows via the portable hash filter of
    :func:`stratified_sample` — so the realized sample is deterministic
    across runs, partitionings, and engines.

    Scale shape: one tiny count aggregation (one row per stratum)
    collected to the driver — the driver-literal pattern; deriving the
    cutoffs from a second sampling-dependent job would not be
    reproducible — then a single row-local filter over the corpus. No
    shuffle of the data itself.
    """
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).cast("string").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return df
    if weights is None:
        weights = {s: 1.0 / len(counts) for s in counts}
    seen = {s: w for s, w in weights.items() if s in counts and w > 0}
    if not seen:
        raise ValueError("mixture_rebalance: no stratum in `weights` exists in the data")
    if total is None:
        total = min(counts[s] / seen[s] for s in seen)
    rates = {s: min(1.0, (total * w) / counts[s]) for s, w in seen.items()}
    return stratified_sample(df, rates, strata_col, key_col, salt)


def sample_anti_join(
    df: DataFrame, sampled: DataFrame, key_col: str
) -> DataFrame:
    """The held-out complement of a sample (rows NOT in ``sampled``),
    via broadcast-able anti-join on the sampling key."""
    keys = sampled.select(F.col(key_col).alias("__k")).distinct()
    return df.join(keys, df[key_col] == F.col("__k"), "left_anti")


__all__ = [
    "deterministic_sample",
    "stratified_sample",
    "fixed_size_sample",
    "split_weighted",
    "mixture_rebalance",
    "sample_anti_join",
]


def fixed_size_per_group(
    df: DataFrame, n: int, group_cols: list[str], key_col: str, salt: str = "fixedg:"
) -> DataFrame:
    """Exactly ``min(n, group size)`` rows PER GROUP — the n smallest
    salted key hashes within each group (stratified fixed-size
    sampling: "1000 docs per language" for eval-set construction).

    One keyed window shuffle (rank over the group partition ordered by
    the row-local hash); deterministic and partitioning-independent
    like every sampler here — re-running on re-partitioned, re-ordered,
    or incrementally-grown data re-selects the same rows per group.
    """
    from pyspark.sql import Window

    h = md5_long63(F.col(key_col).cast("string"), salt)
    w = Window.partitionBy(*group_cols).orderBy(F.asc("__h"), F.asc(key_col))
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__h", "__rn")
    )


def group_aware_split(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights: dict[str, float],
    salt: str = "gsplit:",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: rows are assigned to splits
    by their GROUP (duplicate cluster, source domain, author...), so
    near-duplicates can never straddle the train/eval boundary — THE
    contamination failure mode of row-hash splits on web corpora (a
    doc and its 98%-identical twin landing in train and test makes the
    eval score a memorization probe).

    ``group_col`` may be NULL for ungrouped rows (singletons) — they
    fall back to their own id, keeping the assignment total.  The
    split hash is the same deterministic md5 machinery as
    :func:`split_weighted`, applied to the group key: deterministic
    under any partitioning, reproducible across runs and engines.

    Scale shape: row-local (one hash + threshold CASE per row, zero
    shuffles beyond whatever produced ``group_col``); composes with
    ``dedup.connected_components`` output or any blocking key.
    """
    key = F.coalesce(
        F.col(group_col).cast("string"), F.col(id_col).cast("string")
    )
    return split_weighted(
        df.withColumn("__gkey", key), weights, "__gkey", salt=salt, out_col=out_col
    ).drop("__gkey")


def group_aware_split_sql(
    table_sql: str,
    id_col: str,
    group_col: str,
    weights: dict[str, float],
    salt: str = "gsplit:",
    out_col: str = "split",
) -> str:
    """DuckDB mirror of :func:`group_aware_split`."""
    from cosmos_xenna_spark.functions import md5_long63_sql

    h = f"{md5_long63_sql(f'CAST(COALESCE(CAST({group_col} AS STRING), CAST({id_col} AS STRING)) AS STRING)', prefix=salt)} % {_DENOM}"
    items = sorted(weights.items())
    acc = 0.0
    cases = []
    for name, w in items[:-1]:
        acc += w
        cases.append(f"WHEN {h} < {int(acc * _DENOM)} THEN '{name}'")
    return f"""
    SELECT *, CASE {' '.join(cases)} ELSE '{items[-1][0]}' END AS {out_col}
    FROM ({table_sql})
    """


def weighted_sample_fixed(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    k: int,
    id_cols: list[str],
    salt: str = "wsample:",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly ``min(k, n)``
    rows per group: the Efraimidis–Spirakis scheme with DETERMINISTIC
    pseudo-randomness — each row's exponential arrival time is
    ``-ln(u) / w`` with ``u`` derived from the md5 hash of (salt, id),
    and the k smallest arrivals win.  P(row first) = w / sum(w), the
    sequential weighted-without-replacement law; vary ``salt`` for an
    independent redraw.  Deterministic under any partitioning and
    reproducible across runs (the standing sampler contract); the
    float ``ln`` makes it ROWS-ONLY for cross-engine oracles — its
    law is pinned by frequency property tests instead.

    Rows with non-positive or NULL weight are excluded (zero-weight
    rows must never win).

    Scale shape: priority is row-local; one keyed window (row_number
    over priority) takes the top k per group — the
    fixed_size_per_group shape with a weighted key.
    """
    if k < 1:
        raise ValueError("weighted_sample_fixed needs k >= 1")
    from pyspark.sql import Window

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    h = md5_long63(key, salt)
    # u in (0, 1]: (h + 1) / 2^60  (md5_long63 < 2^60)
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    pri = -F.log(u) / w
    win = Window.partitionBy(*group_cols).orderBy(
        F.asc("__pri"), *[F.asc(c) for c in id_cols]
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__pri", pri)
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__pri", "__rn")
    )


def kfold_assign(
    df: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Stratified k-fold assignment with EXACT balance: within each
    stratum, items ranked by id get ``fold = (rank - 1) % k`` — every
    stratum's folds differ in size by at most 1 (the guarantee
    hash-based splitting (``deterministic_split``) can only give in
    expectation).  Deterministic: rank is a total order on the id.

    Emits the per-(stratum, fold) summary ``(stratum..., fold,
    n_items)`` — the bounded audit artifact; join the same expression
    back onto rows for the assignment itself.  One keyed window + one
    fine-grained aggregation.
    """
    from pyspark.sql import Window

    g = [F.col(c) for c in stratum_cols]
    w = Window.partitionBy(*stratum_cols).orderBy(id_col)
    return (
        df.select(*g, F.col(id_col))
        .withColumn("fold", (F.row_number().over(w) - 1) % k)
        .groupBy(*stratum_cols, "fold")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_items"))
        .select(*g, F.col("fold").cast("bigint").alias("fold"), "n_items")
    )


def kfold_assign_sql(
    table_sql: str, stratum_cols: list[str], id_col: str, k: int = 5
) -> str:
    g = ", ".join(stratum_cols)
    return f"""
    SELECT {g}, CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM (
      SELECT {g},
             (ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {id_col}) - 1) % {k}
               AS fold
      FROM ({table_sql})
    ) GROUP BY {g}, fold
    """
