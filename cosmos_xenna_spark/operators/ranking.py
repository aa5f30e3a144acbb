"""Distributed global ranking.

A global window (``Window.orderBy`` with no partitionBy) makes Spark
move ALL rows to one partition (WindowExec warns loudly) — fine for a
500-row distribution query, fatal at 100 TB. The scalable form:

1. bucket rows by driver-held quantile cuts of the leading sort key —
   the cuts are computed ONCE and baked into the plan as literals, so
   every job that evaluates the bucket expression agrees row-for-row
   (``repartitionByRange`` would NOT give this: its range sampler runs
   independently per job, so a counts job and the ranking job can
   disagree on boundaries — observed, not hypothetical);
2. per-bucket counts → cumulative offsets (driver holds only
   n_buckets integers — cluster-sized, not data-sized);
3. ``row_number`` within each bucket (parallel, hash-shuffled by
   bucket) + the bucket's offset = the exact global row number.

Requires a total order (include a unique tiebreak column) — the same
requirement any deterministic global ranking has. Ties on the leading
key all land in one bucket, preserving the global order across
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_expr(key: str, cuts: list[float]):
    """0-based bucket id: index of the first cut >= key (deterministic,
    driver-literal boundaries). NULL keys route to bucket -1, which
    sorts before every data bucket — matching the nulls-first default
    of ``row_number() OVER (ORDER BY key)`` (approxQuantile ignores
    nulls, so the cuts say nothing about them)."""
    col = F.col(key).cast("double")
    expr = F.lit(len(cuts))  # above every cut -> last bucket
    for i in range(len(cuts) - 1, -1, -1):
        expr = F.when(col <= F.lit(cuts[i]), F.lit(i)).otherwise(expr)
    return F.when(F.col(key).isNull(), F.lit(-1)).otherwise(expr)


def global_rank_stats(
    stats_df: DataFrame,
    key: str,
    num_buckets: int | None = None,
) -> tuple[list[float], dict[int, int], int]:
    """Driver-held ``(cuts, bucket offsets, total rows)`` for one
    ranking key — the two small jobs behind :func:`global_row_number`,
    exposed so composite callers (``rfm_scores``) can run them against
    a cheap materialized frame (and from concurrent driver threads)
    instead of the progressively deeper chained ranking plan. The stats
    depend only on the key column's VALUES, so any frame with the same
    rows yields identical cuts/offsets."""
    n = num_buckets or stats_df.sparkSession.sparkContext.defaultParallelism
    probs = [i / n for i in range(1, n)]
    cuts = (
        sorted(set(stats_df.approxQuantile(key, probs, 0.001))) if probs else []
    )
    bucket = _bucket_expr(key, cuts) if cuts else F.lit(0)
    counts = {
        r["__b"]: r["cnt"]
        for r in stats_df.withColumn("__b", bucket)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):  # bucket -1 (nulls) first -> offset 0
        offsets[b] = acc
        acc += counts[b]
    return cuts, offsets, acc


def apply_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    cuts: list[float],
    offsets: dict[int, int],
    out_col: str = "rn",
) -> DataFrame:
    """Attach the exact global row number given precomputed stats (the
    plan-side half of :func:`global_row_number`)."""
    bucket = _bucket_expr(order_cols[0], cuts) if cuts else F.lit(0)
    bucketed = df.withColumn("__b", bucket)
    # Offsets as bigint literals: int32 row numbers overflow past 2^31
    # rows, which a global rank at scale will exceed.
    offset_col = F.element_at(
        F.create_map(
            *[
                c
                for b in sorted(offsets)
                for c in (F.lit(b), F.lit(offsets[b]).cast("bigint"))
            ]
        ),
        F.col("__b"),
    )
    w = Window.partitionBy("__b").orderBy(*[F.asc(c) for c in order_cols])
    return bucketed.withColumn(
        out_col, F.row_number().over(w).cast("bigint") + offset_col
    ).drop("__b")


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact global row_number over a total order, never single-partition.

    Equivalent to ``row_number() OVER (ORDER BY order_cols)`` with the
    window's all-to-one-partition collapse replaced by quantile
    bucketing + offset arithmetic. ``order_cols[0]`` must be numeric
    (the bucketing key); the full column list defines the total order.
    """
    cuts, offsets, _ = global_rank_stats(df, order_cols[0], num_buckets)
    return apply_global_row_number(df, order_cols, cuts, offsets, out_col)


def global_cumsum(
    df: DataFrame,
    val_col: str,
    order_cols: list[str],
    out_col: str = "cumsum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact inclusive prefix sum of ``val_col`` over a total order,
    never single-partition.

    Equivalent to ``SUM(val) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` with the same quantile-bucket + driver-offset scheme
    as :func:`global_row_number`: per-bucket totals (n_buckets bigints
    on the driver) become literal offsets added to a within-bucket
    running sum. ``val_col`` must be integral (bigint accumulation);
    ``order_cols[0]`` must be numeric and, with the tiebreak columns,
    define a total order.
    """
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    key = order_cols[0]
    probs = [i / n for i in range(1, n)]
    cuts = sorted(set(df.approxQuantile(key, probs, 0.001))) if probs else []
    bucket = _bucket_expr(key, cuts) if cuts else F.lit(0)

    bucketed = df.withColumn("__b", bucket)
    # Per bucket: SUM (NULL for all-NULL buckets -> coalesce to 0, or
    # the offset accumulation TypeErrors on the driver) and the
    # non-NULL count, needed for exact SQL NULL semantics below.
    stats = {
        r["__b"]: (r["tot"] or 0, r["nn"])
        for r in bucketed.groupBy("__b")
        .agg(
            F.sum(F.col(val_col).cast("bigint")).alias("tot"),
            F.count(F.col(val_col)).alias("nn"),
        )
        .collect()
    }
    offsets, prior_nonnull, acc, nn_acc = {}, {}, 0, 0
    for b in sorted(stats):  # bucket -1 (nulls) first -> offset 0
        offsets[b] = acc
        prior_nonnull[b] = nn_acc > 0
        acc += stats[b][0]
        nn_acc += stats[b][1]
    offset_col = F.element_at(
        F.create_map(
            *[
                c
                for b in sorted(offsets)
                for c in (F.lit(b), F.lit(offsets[b]).cast("bigint"))
            ]
        ),
        F.col("__b"),
    )
    w = (
        Window.partitionBy("__b")
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(val_col).cast("bigint")).over(w)
    # SQL SUM over a frame is NULL iff the frame holds no non-NULL
    # value — and the frame spans all EARLIER buckets too. Where a
    # bucket's leading rows are all NULL, `running` is NULL but the
    # true prefix sum is the prior buckets' total (if any of them had
    # a value). prior_nonnull is cluster-sized driver state baked in
    # as literals, like the offsets — and like the offsets it's a FLAT
    # create_map lookup, not a num_buckets-deep WHEN chain (thousands
    # of buckets would inflate Catalyst analysis and risk a driver
    # StackOverflow on the nested expression tree).
    prior_has = F.element_at(
        F.create_map(
            *[
                c
                for b in sorted(prior_nonnull)
                for c in (F.lit(b), F.lit(prior_nonnull[b]))
            ]
        ),
        F.col("__b"),
    )
    return bucketed.withColumn(
        out_col,
        # no prior non-NULLs: offset is 0 and a NULL running stays NULL
        F.when(prior_has, F.coalesce(running, F.lit(0)) + offset_col).otherwise(
            running
        ),
    ).drop("__b")


def global_running_max(
    df: DataFrame,
    val_col: str,
    order_cols: list[str],
    out_col: str = "runmax",
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact inclusive prefix MAX of ``val_col`` over a total order,
    never single-partition.

    Equivalent to ``MAX(val) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` with the quantile-bucket scheme of
    :func:`global_cumsum`: per-bucket maxes collect to the driver
    (n_buckets values), each bucket's literal prefix = max over all
    earlier buckets, and the result is ``greatest(within-bucket running
    max, prefix)``. ``val_col`` must be integral; NULL values are
    skipped like SQL MAX.
    """
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    key = order_cols[0]
    probs = [i / n for i in range(1, n)]
    cuts = sorted(set(df.approxQuantile(key, probs, 0.001))) if probs else []
    bucket = _bucket_expr(key, cuts) if cuts else F.lit(0)

    bucketed = df.withColumn("__b", bucket)
    maxes = {
        r["__b"]: r["mx"]
        for r in bucketed.groupBy("__b")
        .agg(F.max(F.col(val_col).cast("bigint")).alias("mx"))
        .collect()
    }
    prefix: dict[int, int | None] = {}
    best: int | None = None
    for b in sorted(maxes):
        prefix[b] = best  # max over strictly-earlier buckets
        if maxes[b] is not None and (best is None or maxes[b] > best):
            best = maxes[b]
    # Flat map lookup (see global_cumsum): buckets whose prefix is NULL
    # are simply OMITTED from the map — element_at returns NULL for a
    # missing key, and greatest() skips NULLs, giving pure within-
    # bucket semantics there — exactly the unbounded-preceding frame.
    entries = [
        c
        for b in sorted(prefix)
        if prefix[b] is not None
        for c in (F.lit(b), F.lit(prefix[b]).cast("bigint"))
    ]
    prefix_col = (
        F.element_at(F.create_map(*entries), F.col("__b"))
        if entries
        else F.lit(None).cast("bigint")
    )
    w = (
        Window.partitionBy("__b")
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.max(F.col(val_col).cast("bigint")).over(w)
    return bucketed.withColumn(
        out_col, F.greatest(running, prefix_col)
    ).drop("__b")
