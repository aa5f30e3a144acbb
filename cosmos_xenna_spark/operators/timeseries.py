"""Time-series repair: linear interpolation of missing values.

``interpolate_linear`` fills NULLs in a value column from the nearest
non-NULL neighbors in event order within each key partition:

    v(t) = v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev)

Leading gaps back-fill from the first observation, trailing gaps
forward-fill from the last one, and series with no observations stay
NULL — pandas ``interpolate(limit_direction='both')`` semantics.

Scale shape: two frame windows per key partition (forward-looking and
backward-looking, both IGNORE NULLS) — one shuffle on the key, no
global window, no state beyond the frame.  The arithmetic is a fixed
sequence of double ops on per-row scalars, so results are
engine-exact.

Reference parity: none — the reference has no relational layer; this
is standard sensor/metric-pipeline repair the engine needs at the
events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    order_tiebreak: list[str] | None = None,
    out_col: str = "value_filled",
) -> DataFrame:
    """Add ``out_col``: ``value_col`` with NULLs linearly interpolated
    against epoch-microsecond time.  ``key_cols`` partition the series;
    ``order_tiebreak`` breaks ties between equal timestamps (required
    for a deterministic fill when duplicates exist)."""
    order = [F.asc(time_col)] + [F.asc(c) for c in (order_tiebreak or [])]
    back = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.unix_micros(F.col(time_col))
    v = F.col(value_col).cast("double")
    t_obs = F.when(v.isNotNull(), t)
    pv = F.last(v, ignorenulls=True).over(back)
    nv = F.first(v, ignorenulls=True).over(fwd)
    pt = F.last(t_obs, ignorenulls=True).over(back)
    nt = F.first(t_obs, ignorenulls=True).over(fwd)
    frac = (t - pt).cast("double") / (nt - pt).cast("double")
    filled = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)  # leading gap: back-fill
        .when(nv.isNull(), pv)  # trailing gap: forward-fill
        .when(nt == pt, pv)  # degenerate duplicate-time bracket
        .otherwise(pv + (nv - pv) * frac)
    )
    return df.withColumn(out_col, filled)


def interpolate_linear_sql(
    table_sql: str,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    order_tiebreak: list[str] | None = None,
    out_col: str = "value_filled",
) -> str:
    """DuckDB mirror (same window frames, IGNORE NULLS, double math).

    ``table_sql`` is a subquery producing the input relation."""
    part = ", ".join(key_cols)
    order = ", ".join([time_col] + list(order_tiebreak or []))
    back = (
        f"OVER (PARTITION BY {part} ORDER BY {order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    fwd = (
        f"OVER (PARTITION BY {part} ORDER BY {order} "
        f"ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    t = f"epoch_us({time_col})"
    v = f"CAST({value_col} AS DOUBLE)"
    return f"""
    SELECT *, CASE
        WHEN {v} IS NOT NULL THEN {v}
        WHEN pv IS NULL THEN nv
        WHEN nv IS NULL THEN pv
        WHEN nt = pt THEN pv
        ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
      END AS {out_col}
    FROM (
      SELECT *, {t} AS t,
             last_value({v} IGNORE NULLS) {back} AS pv,
             first_value({v} IGNORE NULLS) {fwd} AS nv,
             last_value(CASE WHEN {v} IS NOT NULL THEN {t} END IGNORE NULLS) {back} AS pt,
             first_value(CASE WHEN {v} IS NOT NULL THEN {t} END IGNORE NULLS) {fwd} AS nt
      FROM ({table_sql})
    )
    """


def decayed_sum(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    horizon: int = 20,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exponentially decayed running sum (EWMA numerator) per key:
    ``decayed_i = sum_{j=0..h-1} floor(100 * x_{i-j}) / 2^j`` over the
    event sequence ordered by ``time_col`` — the standard recency-
    weighted activity feature, with decay factor fixed at 1/2.

    Exactness contract (why alpha = 1/2 and floor-to-cents): the value
    quantizes to an integer (``floor(x * 100)``), every weight is a
    power of two, so each term is an exact dyadic rational and the sum
    is EXACT in binary double regardless of addition order — the only
    formulation where two engines (and two partitionings) agree
    bit-for-bit.  A free-form ``pow(alpha, j)`` EWMA is not
    reproducible across engines; this one is.

    Scale shape: one keyed window, ``horizon`` flat ``lag`` terms in a
    single window pass (no self-join, no per-row explode); state is
    bounded by the horizon.
    """
    w = Window.partitionBy(*key_cols).orderBy(time_col, *(order_tiebreak or []))
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    base = df.withColumn("__c", cents)
    terms = [
        (F.coalesce(F.lag("__c", j).over(w), F.lit(0)) / F.lit(float(1 << j)))
        for j in range(horizon)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return base.withColumn("decayed", total.cast("double")).drop("__c")


def decayed_sum_sql(
    table_sql: str,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    horizon: int = 20,
    order_tiebreak: list[str] | None = None,
) -> str:
    part = ", ".join(key_cols)
    order = ", ".join([time_col] + list(order_tiebreak or []))
    w = f"OVER (PARTITION BY {part} ORDER BY {order})"
    terms = " + ".join(
        f"COALESCE(LAG(__c, {j}) {w}, 0) / {float(1 << j)!r}" for j in range(horizon)
    )
    return f"""
    SELECT * EXCLUDE (__c), CAST({terms} AS DOUBLE) AS decayed
    FROM (
      SELECT *, CAST(FLOOR({value_col} * 100) AS BIGINT) AS __c FROM ({table_sql})
    )
    """


def seasonal_baseline(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    n_prev: int = 4,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Seasonal-baseline anomaly score: each value compared to the mean
    of its previous ``n_prev`` observations in the SAME seasonal slot
    (same hour-of-day x day-of-week per key) — "is this Tuesday-9am
    unusual for Tuesday 9am", the metrics-monitoring shape a flat
    trailing window gets wrong on anything with a daily/weekly cycle.

    Exactness contract (the rolling_zscore discipline): values
    quantize to integer cents, the frame sum is an exact integer, and
    the deviation is a fixed double-op sequence on exact integers —
    bit-identical across engines and partitionings. Rows with no
    history in their slot emit NULL baseline/deviation.

    Scale shape: ONE keyed window partitioned by (key, seasonal slot)
    with a bounded rows-frame — no self-join against history, facts
    shuffle once on the fine-grained (key, slot) composite.

    Adds ``slot_how`` (hour-of-week), ``baseline`` and ``deviation``.
    """
    slot = F.dayofweek(ts_col) * 24 + F.hour(ts_col)
    base = df.withColumn("slot_how", slot.cast("bigint")).withColumn(
        "__c", F.floor(F.col(value_col) * 100).cast("bigint")
    )
    w = (
        Window.partitionBy(*key_cols, "slot_how")
        .orderBy(ts_col, *(order_tiebreak or []))
        .rowsBetween(-n_prev, -1)
    )
    n = F.count("__c").over(w)
    s = F.sum("__c").over(w)
    baseline = s.cast("double") / (n.cast("double") * 100.0)
    deviation = F.col("__c").cast("double") / 100.0 - baseline
    return (
        base.withColumn("baseline", F.when(n >= 1, baseline))
        .withColumn("deviation", F.when(n >= 1, deviation))
        .drop("__c")
    )


def seasonal_baseline_sql(
    table: str,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    n_prev: int = 4,
    order_tiebreak: list[str] | None = None,
) -> str:
    """DuckDB mirror. DuckDB ``dayofweek`` is 0-6 (Sunday=0) where
    Spark's is 1-7 (Sunday=1) — the SQL adds 1 to line the slots up."""
    keys = ", ".join(key_cols)
    order = ", ".join([ts_col, *(order_tiebreak or [])])
    return f"""
    WITH base AS (
      SELECT *,
             (dayofweek({ts_col}) + 1) * 24 + hour({ts_col}) AS slot_how,
             CAST(floor({value_col} * 100) AS BIGINT) AS c
      FROM {table}
    ),
    win AS (
      SELECT *,
             COUNT(c) OVER w AS n,
             SUM(c) OVER w AS s
      FROM base
      WINDOW w AS (PARTITION BY {keys}, slot_how ORDER BY {order}
                   ROWS BETWEEN {n_prev} PRECEDING AND 1 PRECEDING)
    )
    SELECT * EXCLUDE (n, s, c),
           CASE WHEN n >= 1 THEN CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) END AS baseline,
           CASE WHEN n >= 1 THEN CAST(c AS DOUBLE) / 100.0
                - CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) END AS deviation
    FROM win
    """


def cusum_changepoint(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    drift_cents: int,
    threshold_cents: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """One-sided CUSUM change detection per series: the classic Page
    statistic ``S_t = max(0, S_{t-1} + x_t - k)`` with alarm at
    ``S_t >= h`` — level-shift detection for metric streams (a mean
    shift of d is flagged fastest with ``k ~ d/2``).

    The recurrence is non-associative, which normally forces a
    sequential scan — but it has the exact closed form

        S_t = cum_t - min(0, min_{j<=t} cum_j),   cum_t = sum_{i<=t}(x_i - k)

    so the whole statistic is TWO frame functions over ONE keyed
    window (running sum + running min), fully distributed, no
    recursion, no state.  Values quantize to integer cents and ``k``/
    ``h`` are given in cents (``drift_cents``, ``threshold_cents``),
    so the statistic is an exact integer — bit-identical across
    engines and partitionings.

    Adds ``cusum`` (cents, BIGINT) and ``alarm`` (0/1 BIGINT).

    Scale shape: one shuffle on the series key; both frames ride the
    same window exchange; O(1) per-row state.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col, *(order_tiebreak or []))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = F.floor(F.col(value_col) * 100).cast("bigint") - F.lit(int(drift_cents))
    base = df.withColumn("__d", c)
    cum = F.sum("__d").over(w)
    s = cum - F.least(F.lit(0).cast("bigint"), F.min(cum).over(w))
    return (
        base.withColumn("cusum", s.cast("bigint"))
        .withColumn("alarm", (F.col("cusum") >= threshold_cents).cast("bigint"))
        .drop("__d")
    )


def cusum_changepoint_sql(
    table_sql: str,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    drift_cents: int,
    threshold_cents: int,
    order_tiebreak: list[str] | None = None,
) -> str:
    """DuckDB mirror — same closed form over the same frames."""
    part = ", ".join(key_cols)
    order = ", ".join([time_col, *(order_tiebreak or [])])
    w = (
        f"OVER (PARTITION BY {part} ORDER BY {order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return f"""
    WITH d AS (
      SELECT *, CAST(FLOOR({value_col} * 100) AS BIGINT) - {int(drift_cents)} AS __d
      FROM ({table_sql})
    ),
    c AS (
      SELECT *, CAST(SUM(__d) {w} AS BIGINT) AS __cum FROM d
    )
    SELECT * EXCLUDE (__d, __cum),
           CAST(__cum - LEAST(0, MIN(__cum) {w}) AS BIGINT) AS cusum,
           CAST(__cum - LEAST(0, MIN(__cum) {w}) >= {int(threshold_cents)} AS BIGINT) AS alarm
    FROM c
    """


def autocorrelation(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    max_lag: int,
    order_tiebreak: list[str] | None = None,
    scale: int = 100,
) -> DataFrame:
    """Sample autocorrelation per series at lags ``1..max_lag`` — the
    periodicity / burstiness profile (is user activity self-similar at
    lag 7? is a metric mean-reverting?).

    Per (key, lag) the Pearson correlation over the aligned pair set
    ``{(x_t, x_{t-lag})}``: values quantize to integers
    (``floor(x * scale)``), the five cross/power sums accumulate in
    DECIMAL(38,0) — exact, order-independent — and the finish

        r = (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))

    is a fixed double-op sequence on per-group scalars (mirrored
    verbatim in :func:`autocorrelation_sql`), so results are
    bit-identical across engines and partitionings.  Degenerate pair
    sets (n < 2 or zero variance on either margin) emit NULL.

    Returns one row per (key, lag): ``(key..., lag, n_pairs, acf)``.

    Scale shape: all ``max_lag`` lag columns ride ONE keyed window
    pass, the stack/explode is row-local (x max_lag, bounded), and the
    aggregation shuffles once on the fine-grained (key, lag) composite
    — no self-join of the series against itself.
    """
    w = Window.partitionBy(*key_cols).orderBy(time_col, *(order_tiebreak or []))
    c = F.floor(F.col(value_col) * scale).cast("bigint")
    base = df.withColumn("__c", c)
    lagged = base.select(
        *key_cols,
        "__c",
        *[F.lag("__c", j).over(w).alias(f"__l{j}") for j in range(1, max_lag + 1)],
    )
    pairs = lagged.select(
        *key_cols,
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("bigint").alias("lag"),
                        F.col("__c").alias("x"),
                        F.col(f"__l{j}").alias("y"),
                    )
                    for j in range(1, max_lag + 1)
                ]
            )
        ),
    ).filter(F.col("y").isNotNull())
    x = F.col("x").cast("decimal(38,0)")
    y = F.col("y").cast("decimal(38,0)")
    agg = pairs.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = F.col("n_pairs").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    ok = (F.col("n_pairs") >= 2) & (varx > 0) & (vary > 0)
    return agg.withColumn(
        "acf", F.when(ok, (n * sxy - sx * sy) / F.sqrt(varx * vary))
    ).drop("__sx", "__sy", "__sxx", "__syy", "__sxy")


def autocorrelation_sql(
    table_sql: str,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    max_lag: int,
    order_tiebreak: list[str] | None = None,
    scale: int = 100,
) -> str:
    """DuckDB mirror: one window CTE computing every lag, stacked by
    UNION ALL; HUGEINT sums go to DOUBLE through the string round-trip
    (same exactness class as Spark's DECIMAL(38,0))."""
    from cosmos_xenna_spark.operators.stats import dec_to_double_sql

    keys = ", ".join(key_cols)
    order = ", ".join([time_col, *(order_tiebreak or [])])
    w = f"OVER (PARTITION BY {keys} ORDER BY {order})"
    lag_cols = ", ".join(
        f"LAG(__c, {j}) {w} AS __l{j}" for j in range(1, max_lag + 1)
    )
    stack = "\n      UNION ALL ".join(
        f"SELECT {keys}, CAST({j} AS BIGINT) AS lag, __c AS x, __l{j} AS y FROM lagged"
        for j in range(1, max_lag + 1)
    )
    sx = dec_to_double_sql("__sx")
    sy = dec_to_double_sql("__sy")
    sxx = dec_to_double_sql("__sxx")
    syy = dec_to_double_sql("__syy")
    sxy = dec_to_double_sql("__sxy")
    return f"""
    WITH lagged AS (
      SELECT {keys}, CAST(FLOOR({value_col} * {scale}) AS BIGINT) AS __c, {lag_cols}
      FROM (SELECT * FROM ({table_sql}))
    ),
    pairs AS (
      {stack}
    ),
    sums AS (
      SELECT {keys}, lag, COUNT(*) AS n_pairs,
             SUM(x) AS __sx, SUM(y) AS __sy,
             SUM(x * x) AS __sxx, SUM(y * y) AS __syy, SUM(x * y) AS __sxy
      FROM pairs WHERE y IS NOT NULL
      GROUP BY {keys}, lag
    ),
    fin AS (
      SELECT {keys}, lag, n_pairs,
             CAST(n_pairs AS DOUBLE) AS n,
             {sx} AS sx, {sy} AS sy, {sxx} AS sxx, {syy} AS syy, {sxy} AS sxy
      FROM sums
    )
    SELECT {keys}, lag, n_pairs,
           CASE WHEN n_pairs >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN (n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
           END AS acf
    FROM fin
    """


def resample_ffill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_secs: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Resample each series onto a regular ``step_secs`` grid with
    forward-fill — the distributed ``resample().ffill()``: one row per
    (key, grid instant) carrying the last observed value at or before
    that instant.  Grid points span each key's OWN active range
    (``ceil(min/step) .. floor(max/step)``), so every emitted point
    has a preceding observation and the fill is total (no NULLs).

    Implementation is the union-spine trick, NOT an as-of join: grid
    rows (value NULL) union with the observations, ONE keyed window
    ordered by (epoch, is_grid, tiebreak) forward-fills via
    ``last(value) IGNORE NULLS``, and only grid rows are kept.  An
    observation exactly on a grid instant sorts before it and wins.

    Returns ``(key..., grid_ts, value_ffill)``.

    Scale shape: one aggregation for the per-key bounds, a row-local
    sequence explode (spine size = active span / step, per key), and
    ONE keyed window over observations + spine — no join, no state
    beyond the running last value.
    """
    step_us = step_secs * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    tie = [F.col(c) for c in (order_tiebreak or [])]
    obs = df.select(
        *[F.col(c) for c in key_cols],
        us.alias("__us"),
        F.lit(0).alias("__is_grid"),
        F.col(value_col).alias("__v"),
        *tie,
    )
    bounds = df.groupBy(*key_cols).agg(
        F.ceil(F.min(us) / F.lit(step_us)).alias("__k_lo"),
        F.floor(F.max(us) / F.lit(step_us)).alias("__k_hi"),
    )
    grid = (
        bounds.filter(F.col("__k_lo") <= F.col("__k_hi"))
        .select(
            *[F.col(c) for c in key_cols],
            F.explode(F.sequence("__k_lo", "__k_hi")).alias("__k"),
        )
        .select(
            *[F.col(c) for c in key_cols],
            (F.col("__k") * step_us).alias("__us"),
            F.lit(1).alias("__is_grid"),
            F.lit(None).cast(dict(df.dtypes)[value_col]).alias("__v"),
            *[F.lit(None).cast(dict(df.dtypes)[c]).alias(c) for c in (order_tiebreak or [])],
        )
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__us", "__is_grid", *(order_tiebreak or []))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        obs.unionByName(grid)
        .withColumn("__fill", F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_grid") == 1)
        .select(
            *key_cols,
            F.timestamp_micros(F.col("__us")).alias("grid_ts"),
            F.col("__fill").alias("value_ffill"),
        )
    )


def resample_ffill_sql(
    table_sql: str,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step_secs: int,
    order_tiebreak: list[str] | None = None,
) -> str:
    """DuckDB mirror — same union spine and IGNORE NULLS fill.  NULL
    tiebreak columns on grid rows sort consistently because the order
    is already total before them ((us, is_grid) pins grid rows)."""
    step_us = step_secs * 1_000_000
    keys = ", ".join(key_cols)
    tie = ", ".join(order_tiebreak or [])
    tie_sel = (", " + ", ".join(f"{c}" for c in order_tiebreak)) if order_tiebreak else ""
    tie_null = (
        ", " + ", ".join(f"NULL AS {c}" for c in order_tiebreak)
    ) if order_tiebreak else ""
    order = f"__us, __is_grid{', ' + tie if tie else ''}"
    return f"""
    WITH t AS ({table_sql}),
    obs AS (
      SELECT {keys}, epoch_us({ts_col}) AS __us, 0 AS __is_grid,
             {value_col} AS __v{tie_sel}
      FROM t
    ),
    bounds AS (
      SELECT {keys},
             CAST(CEIL(MIN(epoch_us({ts_col})) / {step_us}.0) AS BIGINT) AS k_lo,
             CAST(FLOOR(MAX(epoch_us({ts_col})) / {step_us}.0) AS BIGINT) AS k_hi
      FROM t GROUP BY {keys}
    ),
    grid AS (
      SELECT {keys}, CAST(UNNEST(range(k_lo, k_hi + 1)) AS BIGINT) * {step_us} AS __us,
             1 AS __is_grid, NULL AS __v{tie_null}
      FROM bounds WHERE k_lo <= k_hi
    ),
    unioned AS (
      SELECT * FROM obs UNION ALL SELECT * FROM grid
    ),
    filled AS (
      SELECT *, last_value(__v IGNORE NULLS) OVER (
               PARTITION BY {keys} ORDER BY {order}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __fill
      FROM unioned
    )
    SELECT {keys}, make_timestamp(__us) AS grid_ts, __fill AS value_ffill
    FROM filled WHERE __is_grid = 1
    """


def rolling_median(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window_rows: int,
    order_tiebreak: list[str] | None = None,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Exact rolling median over the trailing ``window_rows`` events
    (inclusive) per key — the robust smoother for spiky series (a
    single outlier moves a rolling MEAN but not this).

    The frame's cent-quantized values ride ONE keyed window as a
    ``collect_list``; ``array_sort`` + middle-element pick finish
    row-locally.  Even-length frames average the two middles — exact
    integers with ONE final division by 200.0, so both engines agree
    bit-for-bit.  State is O(window_rows) per row (the
    rolling_distinct_count contract).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col, *(order_tiebreak or []))
        .rowsBetween(-(window_rows - 1), 0)
    )
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    arr = F.array_sort(F.collect_list(cents).over(w))
    n = F.size(arr)
    # FLOOR the middle-index divisions before casting: a bare `/` +
    # int cast truncates in Spark but ROUNDS in DuckDB (the
    # quantile_cont lesson), which would pick the wrong element for
    # odd frames
    i_lo = F.floor((n + F.lit(1)) / F.lit(2)).cast("int")
    i_hi = F.floor((n + F.lit(2)) / F.lit(2)).cast("int")
    med = (
        F.element_at(arr, i_lo) + F.element_at(arr, i_hi)
    ).cast("double") / F.lit(200.0)
    return df.withColumn(out_col, med)


def rolling_median_sql(
    table_sql: str,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window_rows: int,
    order_tiebreak: list[str] | None = None,
    out_col: str = "rolling_median",
) -> str:
    """DuckDB mirror — same sorted-frame middle pick."""
    part = ", ".join(key_cols)
    order = ", ".join([order_col, *(order_tiebreak or [])])
    w = (
        f"OVER (PARTITION BY {part} ORDER BY {order} "
        f"ROWS BETWEEN {window_rows - 1} PRECEDING AND CURRENT ROW)"
    )
    return f"""
    SELECT * EXCLUDE (__arr),
           CAST(__arr[CAST(FLOOR((len(__arr) + 1) / 2) AS INTEGER)]
                + __arr[CAST(FLOOR((len(__arr) + 2) / 2) AS INTEGER)] AS DOUBLE) / 200.0
             AS {out_col}
    FROM (
      SELECT *,
             list_sort(array_agg(CAST(FLOOR({value_col} * 100) AS BIGINT)) {w}) AS __arr
      FROM ({table_sql})
    )
    """


def sax_motifs(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    breakpoints: list[int],
    motif_len: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """SAX-style symbolic motif mining (Lin et al. 2003, integerized):
    each keyed series is already piecewise-aggregated by the caller
    (one row per (key, order) segment, value in integer cents); the
    segment value maps to a symbol by fixed ``breakpoints``
    (a < bp[0] <= b < bp[1] <= ...), consecutive-SEGMENT windows of
    ``motif_len`` symbols form motifs, and motifs are counted
    corpus-wide — the "which shapes recur across all series" question
    behind pattern-of-life and anomaly triage, answered without any
    float distance.

    Fixed breakpoints (not per-series quantiles) keep the alphabet
    comparable across series and the result bit-exact across engines;
    re-estimate them offline from a profile query when the value
    distribution drifts.  Consecutive means consecutive OBSERVED
    segments (ordering by ``order_col``), not calendar-adjacent —
    gaps do not split motifs; pre-fill with ``resample_ffill`` when
    they should.

    Shape: one keyed lead-window pass + one corpus count — two
    shuffles, alphabet/motif space bounded by len(breakpoints)+1 ^
    motif_len.
    """
    from pyspark.sql import Window

    sym = F.lit(chr(ord("a") + len(breakpoints)))
    for i in reversed(range(len(breakpoints))):
        sym = F.when(
            F.col("__v") < breakpoints[i], F.lit(chr(ord("a") + i))
        ).otherwise(sym)
    base = df.select(
        *[F.col(c) for c in key_cols],
        F.col(order_col).alias("__o"),
        F.col(value_col).cast("bigint").alias("__v"),
    ).withColumn("__sym", sym)
    w = Window.partitionBy(*key_cols).orderBy("__o")
    motif = F.concat(
        *[F.lead("__sym", i).over(w) for i in range(motif_len)]
    )
    motifs = base.withColumn("motif", motif).filter(
        F.length("motif") == motif_len
    )
    return (
        motifs.groupBy("motif")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.count_distinct(*[F.col(c) for c in key_cols])
            .cast("bigint")
            .alias("n_series"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


def sax_motifs_sql(
    table_sql: str,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    breakpoints: list[int],
    motif_len: int = 3,
    min_count: int = 2,
) -> str:
    g = ", ".join(key_cols)
    sym = f"'{chr(ord('a') + len(breakpoints))}'"
    for i in reversed(range(len(breakpoints))):
        sym = (
            f"CASE WHEN v < {breakpoints[i]} THEN '{chr(ord('a') + i)}'"
            f" ELSE {sym} END"
        )
    leads = " || ".join(
        f"LEAD(sym, {i}) OVER (PARTITION BY {g} ORDER BY o)"
        if i
        else "sym"
        for i in range(motif_len)
    )
    return f"""
    WITH base AS (
      SELECT {g}, {order_col} AS o, CAST({value_col} AS BIGINT) AS v
      FROM ({table_sql})
    ),
    symed AS (SELECT {g}, o, {sym} AS sym FROM base),
    motifs AS (
      SELECT {g}, {leads} AS motif FROM symed
    )
    SELECT motif, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT ({g})) AS BIGINT) AS n_series
    FROM motifs WHERE length(motif) = {motif_len}
    GROUP BY motif HAVING COUNT(*) >= {min_count}
    """


def business_days_between(
    start_col: str,
    end_col: str,
) -> "Column":  # noqa: F821 — column-level helper, composes into selects
    """Business days (Mon-Fri) between two dates, exclusive of the
    start day, inclusive of the end day — closed-form weekday
    arithmetic (full weeks x 5 + a weekday-offset correction), no
    calendar table, no explode, exact for any date pair and identical
    in both engines (day-number arithmetic only).

    Returns a Column (bigint; negative when end < start mirrors the
    signed convention).  The closed form: with ``s``/``e`` as epoch
    days and ``dow(x) = (x + 4) % 7`` (0=Mon..6=Sun, epoch day 0 was
    a Thursday=3), business days = 5 * ((e_adj // 7) - (s_adj // 7))
    + clamp(dow) endpoint corrections — implemented as the standard
    "count Mondays..Fridays in (s, e]" difference of per-day prefix
    functions so the correction cannot drift between engines.
    """
    def prefix(col):  # business days in [epoch, col] — prefix function
        d = F.datediff(F.col(col).cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
        dow = F.pmod(d + 3, F.lit(7))  # 0=Mon .. 6=Sun (1970-01-01 = Thu)
        full_weeks = F.expr(
            f"(datediff(CAST({col} AS DATE), DATE '1970-01-01') + 3) div 7"
        ).cast("bigint")
        return full_weeks * 5 + F.least(dow + 1, F.lit(5)) - F.lit(3)

    return (prefix(end_col) - prefix(start_col)).cast("bigint")


def business_days_between_sql(start_col: str, end_col: str) -> str:
    def prefix(col: str) -> str:
        d = f"datediff('day', DATE '1970-01-01', CAST({col} AS DATE))"
        return (
            f"((({d} + 3) // 7) * 5"
            f" + LEAST((({d} + 3) % 7) + 1, 5) - 3)"
        )

    return f"CAST({prefix(end_col)} - {prefix(start_col)} AS BIGINT)"


def run_length_encode(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Run-length encoding of each keyed ordered sequence: one row per
    maximal run of equal consecutive values — ``(key, run_idx,
    value, run_len, start_order)`` — the sequence-compression /
    pattern-of-life reduction (a user emitting [view x12, click x1,
    view x30] is one browsing story in 3 rows, not 43).

    Classic two-window form: a change flag (value != lag(value)),
    its running sum = run id, then one aggregation per run.  Both
    shuffles on the fine-grained entity key; null-safe change
    comparison so NULL values form runs too.
    """
    from pyspark.sql import Window

    g = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*key_cols).orderBy(order_col, tiebreak_col)
    # row 1 always opens a run: a NULL lag is ambiguous (missing vs a
    # genuine NULL predecessor), so the first row is flagged by rank
    changed = F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(
        (~F.col(value_col).eqNullSafe(F.lag(value_col).over(w))).cast("bigint")
    )
    runs = df.withColumn("__chg", changed).withColumn(
        "__run",
        F.sum("__chg").over(
            Window.partitionBy(*key_cols)
            .orderBy(order_col, tiebreak_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        runs.groupBy(*key_cols, "__run")
        .agg(
            F.first(value_col).alias("value"),
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
            F.min(order_col).alias("start_order"),
        )
        .select(
            *g,
            F.col("__run").cast("bigint").alias("run_idx"),
            "value",
            "run_len",
            "start_order",
        )
    )


def run_length_encode_sql(
    table_sql: str,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    tiebreak_col: str,
) -> str:
    g = ", ".join(key_cols)
    return f"""
    WITH flagged AS (
      SELECT {g}, {order_col} AS o, {value_col} AS v,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY {g}
                    ORDER BY {order_col}, {tiebreak_col}) = 1 THEN 1
                  WHEN {value_col} IS DISTINCT FROM
                  LAG({value_col}) OVER (PARTITION BY {g}
                    ORDER BY {order_col}, {tiebreak_col})
                  THEN 1 ELSE 0 END AS chg,
             {tiebreak_col} AS tb
      FROM ({table_sql})
    ),
    runs AS (
      SELECT {g}, o, v,
             SUM(chg) OVER (PARTITION BY {g} ORDER BY o, tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM flagged
    )
    SELECT {g}, CAST(run AS BIGINT) AS run_idx,
           MIN(v) AS value,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           MIN(o) AS start_order
    FROM runs GROUP BY {g}, run
    """
