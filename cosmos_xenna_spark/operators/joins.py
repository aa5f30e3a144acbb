"""Composite joins Spark lacks as single built-ins.

``range_join_bucketed``
    A value-in-[lo,hi) interval join executed as an *equi-join on a
    bucket key* + residual filter, instead of the broadcast-nested-loop
    plan Catalyst would pick for a raw theta join. Each interval row is
    exploded to the buckets it overlaps (``sequence``), each fact row
    maps to exactly one bucket, and the join is hash-partitioned on the
    bucket id — O(n + m·buckets_per_interval) work, shuffle-friendly,
    skew handled by AQE. This is the standard rewrite for 100 TB range
    joins (SURVEY.md §4.2 item 3).

``asof_join``
    Backward-inclusive as-of join (latest right row with
    right_time <= left_time per key), executed as union + ordered
    window ``last(..., ignorenulls)`` — one shuffle on (key), no
    per-row probing, no BNL. (SURVEY.md §2.B "as-of join = union +
    window last(value) ignore nulls pattern".)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join fact rows to interval rows with lo <= value < hi.

    ``bucket_width`` should be chosen near the typical interval width so
    each interval explodes to ~1-2 buckets.
    """
    w = F.lit(bucket_width)
    bucketed_intervals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge does not
                # reach into the next bucket.
                F.ceil(F.col(hi_col) / w).cast("long") - 1,
            )
        ),
    )
    bucketed_facts = facts.withColumn("__bucket", F.floor(F.col(value_col) / w).cast("long"))
    joined = bucketed_facts.join(bucketed_intervals, on="__bucket", how="inner").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return joined.drop("__bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_tiebreak: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    For every left row, attach the right row of the same ``on`` key with
    the greatest (right_time, right_tiebreak) such that
    right_time <= left_time; nulls if none (left-join semantics).
    ``tolerance`` (an INTERVAL string, e.g. ``"30 minutes"``) bounds the
    lookback: a match older than left_time - tolerance is nulled out —
    pandas ``merge_asof(tolerance=...)`` semantics.

    Single shuffle: both sides union into one relation sorted by
    (key, time, side, tiebreak); right rows sort before left rows at
    equal time so "at-or-before" is inclusive.
    """
    lcols = [c for c in left.columns]
    vcols = list(value_cols)

    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(dict(right.dtypes)[right_time]).alias("__rt"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in vcols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(right_tiebreak).cast("long").alias("__tb"),
        F.col(right_time).alias("__rt"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c) for c in vcols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fill_cols = vcols + ["__rt"]
    filled = unioned.select(
        "*",
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(f"__v_{c}") for c in fill_cols],
    )
    rows = filled.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        within = F.col("__v___rt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        value_exprs = [
            F.when(within, F.col(f"__v_{c}")).alias(c) for c in vcols
        ]
    else:
        value_exprs = [F.col(f"__v_{c}").alias(c) for c in vcols]
    return rows.select(*[F.col(c) for c in lcols], *value_exprs)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval x interval overlap join: all (left, right) row pairs
    whose CLOSED intervals intersect (``l_lo <= r_hi AND r_lo <=
    l_hi``) — session-vs-campaign overlap, downtime-vs-deploy windows,
    temporal-validity joins.

    A raw theta join plans as a broadcast-nested-loop; this is the
    grid-bucket rewrite (both sides explode to the ``bucket_width``
    cells they touch, equi-join on the cell id, residual overlap
    filter). A pair overlapping several shared cells would emit once
    per cell, so the join keeps ONLY the cell containing the overlap's
    START (``floor(greatest(l_lo, r_lo) / w)``) — exactly-once without
    a distinct (no post-join dedup shuffle, the pair-emission trick
    from spatial join literature).

    ``bucket_width`` near the typical interval length keeps the
    explode factor ~1-2 cells per row. One equi-join shuffle on the
    cell id; AQE handles cell skew (a hot cell is a genuine data
    hotspot, same contract as range_join_bucketed).
    """
    w = F.lit(float(bucket_width))
    lb = left.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(l_lo) / w).cast("long"),
                F.floor(F.col(l_hi) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(F.col(r_lo) / w).cast("long"),
                F.floor(F.col(r_hi) / w).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "__cell")
        .filter(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (
                F.col("__cell")
                == F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / w).cast("long")
            )
        )
        .drop("__cell")
    )


def grid_neighbor_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    cell: int | None = None,
) -> DataFrame:
    """All point pairs within Euclidean distance ``radius`` — the 2-D
    spatial self-join (geo proximity, 2-D embedding projections,
    layout QA), via the grid-cell rewrite.

    Coordinates must be INTEGERS (callers quantize floats first —
    ``floor(x * 10^k)`` — so the squared distance is exact and
    cross-engine comparable). Each point lands in its home
    ``cell x cell`` grid cell; the probe side explodes to the 3x3
    neighborhood, the equi-join runs on the cell id, and the exact
    ``dist2 <= radius^2`` filter verifies row-locally. With
    ``cell >= radius`` (enforced), every qualifying pair shares a
    probe/home cell in exactly one way and ``id_a < id_b`` keeps one
    orientation — exactly-once with NO post-join distinct (the
    interval_overlap_join contract, one dimension up).

    Returns ``(id_a, id_b, dist2)``.

    Scale shape: one equi-join shuffle on (cell_x, cell_y); the probe
    side carries a fixed 9x explode. Cell population skew is data
    skew (a dense cell is a genuine hotspot) — AQE skew-join splits
    it; candidate count tracks the true neighbor density because the
    grid bounds the search to ~(3 cell / radius)^2 x the true pairs.
    """
    if cell is None:
        cell = radius
    if cell < radius:
        raise ValueError(f"cell ({cell}) must be >= radius ({radius})")
    cw = F.lit(int(cell))
    home = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("bx"),
        F.col(y_col).alias("by"),
        F.floor(F.col(x_col) / cw).alias("cx"),
        F.floor(F.col(y_col) / cw).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        points.select(
            F.col(id_col).alias("id_a"),
            F.col(x_col).alias("ax"),
            F.col(y_col).alias("ay"),
            F.floor(F.col(x_col) / cw).alias("hx"),
            F.floor(F.col(y_col) / cw).alias("hy"),
        )
        .withColumn("__o", F.explode(offsets))
        .select(
            "id_a",
            "ax",
            "ay",
            (F.col("hx") + F.col("__o.dx")).alias("cx"),
            (F.col("hy") + F.col("__o.dy")).alias("cy"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probe.join(home, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", d2.cast("bigint"))
        .filter(F.col("dist2") <= radius * radius)
        .select("id_a", "id_b", "dist2")
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Exact pre-flight join-size and skew profile WITHOUT executing
    the join: ``|A JOIN B| = sum_k cA(k) * cB(k)`` over per-key counts
    — the check a pipeline runs before an unfamiliar key join at
    100 TB, where one hot key can make the output quadratic (the
    classic accidental many-to-many).

    Returns the ``top_n`` heaviest keys by output contribution:
    ``(key..., rows_left, rows_right, join_rows, total_join_rows,
    share_ppm)`` — ``total_join_rows`` repeated on every row so one
    look answers "how big, and is it one key's fault".

    Scale shape: two per-key count aggregations (map-side partial, each
    output is key-cardinality-sized), one equi-join of the two count
    tables, a global sum reduced to ONE row and broadcast back (the
    heavy-hitters single-row pattern), and a top-n sort over the
    matching-keys table — the fact tables are each scanned once and
    never joined to each other.
    """
    ca = left.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("rows_left"))
    cb = right.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("rows_right"))
    prod = ca.join(cb, key_cols).withColumn(
        "join_rows", (F.col("rows_left") * F.col("rows_right")).cast("bigint")
    )
    total = prod.groupBy().agg(F.sum("join_rows").alias("total_join_rows"))
    return (
        prod.join(F.broadcast(total))
        .orderBy(F.desc("join_rows"), *key_cols)
        .limit(top_n)
        .select(
            *key_cols,
            F.col("rows_left").cast("bigint").alias("rows_left"),
            F.col("rows_right").cast("bigint").alias("rows_right"),
            "join_rows",
            F.col("total_join_rows").cast("bigint").alias("total_join_rows"),
            F.expr("join_rows * 1000000L div total_join_rows").alias("share_ppm"),
        )
    )


def join_size_estimate_sql(
    left_sql: str, right_sql: str, key_cols: list[str], top_n: int = 10
) -> str:
    keys = ", ".join(key_cols)
    return f"""
    WITH ca AS (SELECT {keys}, COUNT(*) AS rows_left FROM ({left_sql}) GROUP BY {keys}),
    cb AS (SELECT {keys}, COUNT(*) AS rows_right FROM ({right_sql}) GROUP BY {keys}),
    prod AS (
      SELECT {keys}, rows_left, rows_right,
             CAST(rows_left * rows_right AS BIGINT) AS join_rows
      FROM ca JOIN cb USING ({keys})
    )
    SELECT {keys}, CAST(rows_left AS BIGINT) AS rows_left,
           CAST(rows_right AS BIGINT) AS rows_right, join_rows,
           CAST((SELECT SUM(join_rows) FROM prod) AS BIGINT) AS total_join_rows,
           CAST(join_rows * 1000000 // (SELECT SUM(join_rows) FROM prod) AS BIGINT)
             AS share_ppm
    FROM prod
    ORDER BY join_rows DESC, {keys}
    LIMIT {top_n}
    """


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    key_cols: list[str],
    fact_time_col: str,
    version_time_col: str,
    version_cols: list[str],
    fact_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Point-in-time (as-of) dimension join: each fact row picks up the
    dimension attributes from the LATEST version effective at or
    before the fact's timestamp — the SCD2 lookup every warehouse
    fact pipeline runs ("the customer's segment AS OF the order
    date"), with NULL attributes for facts predating the first
    version.

    Implemented as the union-spine, NOT a range join: version rows and
    fact rows union into one relation, ONE keyed window ordered by
    (time, is_fact) carries each version attribute forward via
    ``last(...) IGNORE NULLS``, and only fact rows are kept.  A
    version effective exactly at the fact time sorts before it and
    wins.  Cost is one shuffle on the dimension key regardless of
    version count — a validity-interval range join would shuffle the
    same data AND need interval bucketing.

    Returns all fact columns plus ``version_cols``.
    """
    f_cols = facts.columns
    dim_types = dict(versions.dtypes)
    obs = versions.select(
        *[F.col(c) for c in key_cols],
        F.col(version_time_col).alias("__t"),
        F.lit(0).alias("__is_fact"),
        *[F.col(c) for c in version_cols],
        *[F.lit(None).cast(t).alias(f"__f_{c}") for c, t in facts.dtypes if c not in key_cols],
    )
    fct = facts.select(
        *[F.col(c) for c in key_cols],
        F.col(fact_time_col).alias("__t"),
        F.lit(1).alias("__is_fact"),
        *[F.lit(None).cast(dim_types[c]).alias(c) for c in version_cols],
        *[F.col(c).alias(f"__f_{c}") for c in f_cols if c not in key_cols],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t", "__is_fact", *[f"__f_{c}" for c in (fact_tiebreak or [])])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = obs.unionByName(fct).select(
        *key_cols,
        "__is_fact",
        *[F.col(f"__f_{c}").alias(c) for c in f_cols if c not in key_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in version_cols],
    )
    return filled.filter(F.col("__is_fact") == 1).drop("__is_fact")


def point_in_time_join_sql(
    facts_sql: str,
    versions_sql: str,
    key_cols: list[str],
    fact_time_col: str,
    version_time_col: str,
    version_cols: list[str],
    fact_cols: list[str],
    fact_tiebreak: list[str] | None = None,
) -> str:
    """DuckDB mirror — same union spine and IGNORE NULLS carry.
    ``fact_cols`` lists the non-key fact columns to carry through."""
    keys = ", ".join(key_cols)
    vnull = ", ".join(f"NULL AS {c}" for c in version_cols)
    fnull = ", ".join(f"NULL AS {c}" for c in fact_cols)
    vsel = ", ".join(version_cols)
    fsel = ", ".join(fact_cols)
    tie = ", " + ", ".join(fact_tiebreak) if fact_tiebreak else ""
    carry = ", ".join(
        f"last_value({c} IGNORE NULLS) OVER (PARTITION BY {keys} "
        f"ORDER BY __t, __is_fact{tie} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {c}"
        for c in version_cols
    )
    return f"""
    WITH unioned AS (
      SELECT {keys}, {version_time_col} AS __t, 0 AS __is_fact, {vsel}, {fnull}
      FROM ({versions_sql})
      UNION ALL BY NAME
      SELECT {keys}, {fact_time_col} AS __t, 1 AS __is_fact, {vnull}, {fsel}
      FROM ({facts_sql})
    ),
    filled AS (
      SELECT {keys}, __is_fact, {fsel}, {carry}
      FROM unioned
    )
    SELECT * EXCLUDE (__is_fact) FROM filled WHERE __is_fact = 1
    """


def nearest_time_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_id: str,
) -> DataFrame:
    """Nearest-in-TIME join (bidirectional as-of): for every left row,
    the right row of the same key with minimum ``|right_time -
    left_time|`` — the "closest reading to this event" attach that a
    backward-only as-of misses whenever the nearest observation is
    just AFTER the probe (sensor alignment, nearest price tick,
    closest log line).

    Times are integer (epoch micros/seconds — caller converts), so
    distances are exact bigints.  Tie rules, fixed and mirrored in the
    SQL oracle: equal distance prefers the EARLIER right row; among
    right rows at the same timestamp the backward candidate resolves
    to the largest ``right_id`` and the forward to the smallest (scan
    order of one shared window sort).

    Shape: the as-of union-sweep doubled — both sides union into ONE
    relation, one partition sort per key, a backward last() and a
    forward first() window over the same sort; never a range join, so
    the single shuffle on the key is the whole network cost at any
    scale.
    """
    lcols = list(left.columns)
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).cast("long").alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__rid"),
        *[F.col(c) for c in lcols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).cast("long").alias("__t"),
        F.lit(0).alias("__is_left"),
        F.col(right_id).cast("long").alias("__rid"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
    )
    u = l_tagged.unionByName(r_tagged)
    order = [F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rid").asc()]
    wb = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    right_t = F.when(F.col("__is_left") == 0, F.col("__t"))
    filled = u.select(
        "*",
        F.last(F.col("__rid"), ignorenulls=True).over(wb).alias("__b_rid"),
        F.last(right_t, ignorenulls=True).over(wb).alias("__b_t"),
        F.first(F.col("__rid"), ignorenulls=True).over(wf).alias("__f_rid"),
        F.first(right_t, ignorenulls=True).over(wf).alias("__f_t"),
    ).filter(F.col("__is_left") == 1)
    db = F.col("__t") - F.col("__b_t")
    df_ = F.col("__f_t") - F.col("__t")
    take_b = F.col("__b_t").isNotNull() & (
        F.col("__f_t").isNull() | (db <= df_)
    )
    return filled.select(
        *[F.col(c) for c in lcols],
        F.when(take_b, F.col("__b_rid"))
        .otherwise(F.col("__f_rid"))
        .cast("bigint")
        .alias("nearest_id"),
        F.when(take_b, F.col("__b_t"))
        .otherwise(F.col("__f_t"))
        .cast("bigint")
        .alias("nearest_t"),
        F.when(take_b, -db)
        .otherwise(df_)
        .cast("bigint")
        .alias("signed_diff"),
    )


def nearest_time_join_sql(
    left_sql: str,
    right_sql: str,
    on: str,
    left_time: str,
    right_time: str,
    right_id: str,
    left_cols: list[str],
) -> str:
    lc = ", ".join(left_cols)
    lnull = ", ".join(f"NULL AS {c}" for c in left_cols)
    return f"""
    WITH u AS (
      SELECT {on} AS k, CAST({left_time} AS BIGINT) AS t, 1 AS is_left,
             NULL::BIGINT AS rid, {lc}
      FROM ({left_sql})
      UNION ALL
      SELECT {on}, CAST({right_time} AS BIGINT), 0,
             CAST({right_id} AS BIGINT), {lnull}
      FROM ({right_sql})
    ),
    filled AS (
      SELECT *,
        LAST_VALUE(rid IGNORE NULLS) OVER (
          PARTITION BY k ORDER BY t, is_left, rid
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_rid,
        LAST_VALUE(CASE WHEN is_left = 0 THEN t END IGNORE NULLS) OVER (
          PARTITION BY k ORDER BY t, is_left, rid
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_t,
        FIRST_VALUE(rid IGNORE NULLS) OVER (
          PARTITION BY k ORDER BY t, is_left, rid
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_rid,
        FIRST_VALUE(CASE WHEN is_left = 0 THEN t END IGNORE NULLS) OVER (
          PARTITION BY k ORDER BY t, is_left, rid
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_t
      FROM u
    )
    SELECT {lc},
           CAST(CASE WHEN b_t IS NOT NULL AND (f_t IS NULL OR t - b_t <= f_t - t)
                     THEN b_rid ELSE f_rid END AS BIGINT) AS nearest_id,
           CAST(CASE WHEN b_t IS NOT NULL AND (f_t IS NULL OR t - b_t <= f_t - t)
                     THEN b_t ELSE f_t END AS BIGINT) AS nearest_t,
           CAST(CASE WHEN b_t IS NOT NULL AND (f_t IS NULL OR t - b_t <= f_t - t)
                     THEN b_t - t ELSE f_t - t END AS BIGINT) AS signed_diff
    FROM filled WHERE is_left = 1
    """
