"""Time-series repair query: linear interpolation over the events
table with deterministically injected gaps (the corpus has no NULLs,
so ``event_id % 13 = 0`` values are nulled identically on both
engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.timeseries import (
    seasonal_baseline,
    seasonal_baseline_sql,
    decayed_sum,
    decayed_sum_sql,
    interpolate_linear,
    interpolate_linear_sql,
)
from cosmos_xenna_spark.queries import register

_GAPPED_SQL = """
    SELECT event_id, user_id, ts,
           CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value
    FROM events
"""


@register(
    "q_interpolate_linear",
    oracle=(
        "SELECT event_id, user_id, value_filled FROM ("
        + interpolate_linear_sql(
            _GAPPED_SQL, ["user_id"], "ts", "value", order_tiebreak=["event_id"]
        )
        + ")"
    ),
    description="linear interpolation of missing series values from nearest "
    "observed neighbors (IGNORE NULLS frame windows; one shuffle on the "
    "series key, no global window; leading/trailing gaps back/forward-fill)",
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 13 == 0, F.lit(None)).otherwise(F.col("value")).alias("value"),
    )
    out = interpolate_linear(ev, ["user_id"], "ts", "value", order_tiebreak=["event_id"])
    return out.select("event_id", "user_id", "value_filled")


@register(
    "q_decayed_sum",
    oracle=(
        "SELECT event_id, user_id, decayed FROM ("
        + decayed_sum_sql(
            "SELECT event_id, user_id, ts, value FROM events",
            ["user_id"],
            "ts",
            "value",
            horizon=20,
            order_tiebreak=["event_id"],
        )
        + ")"
    ),
    description="exponentially decayed running sum per user (EWMA numerator, "
    "alpha=1/2, 20-event horizon) — dyadic-exact so both engines agree "
    "bit-for-bit; one keyed window, 20 flat lag terms, no self-join",
)
def q_decayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = decayed_sum(ev, ["user_id"], "ts", "value", horizon=20, order_tiebreak=["event_id"])
    return out.select("event_id", "user_id", "decayed")


@register(
    "q_seasonal_anomaly",
    oracle=(
        "SELECT event_id, user_id, slot_how, baseline, deviation FROM ("
        + seasonal_baseline_sql(
            "(SELECT event_id, user_id, ts, value FROM events)",
            ["user_id"],
            "ts",
            "value",
            n_prev=4,
            order_tiebreak=["event_id"],
        )
        + ")"
    ),
    description="seasonal-baseline anomaly score: each event vs the mean of "
    "its previous 4 observations in the same (user, hour-of-week) slot — "
    "one keyed window on the fine-grained composite key, cent-quantized "
    "integer sums so both engines agree bit-for-bit; the monitoring shape "
    "a flat trailing window gets wrong on cyclic data",
)
def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = seasonal_baseline(ev, ["user_id"], "ts", "value", n_prev=4, order_tiebreak=["event_id"])
    return out.select("event_id", "user_id", "slot_how", "baseline", "deviation")


from cosmos_xenna_spark.operators.timeseries import (  # noqa: E402
    autocorrelation,
    autocorrelation_sql,
    cusum_changepoint,
    cusum_changepoint_sql,
)


@register(
    "q_cusum_changepoint",
    oracle=(
        "SELECT event_id, user_id, cusum, alarm FROM ("
        + cusum_changepoint_sql(
            "SELECT event_id, user_id, ts, value FROM events",
            ["user_id"],
            "ts",
            "value",
            drift_cents=550,
            threshold_cents=2500,
            order_tiebreak=["event_id"],
        )
        + ")"
    ),
    description="one-sided CUSUM level-shift detection per user (Page "
    "statistic, k=5.50, h=25.00): the non-associative recurrence "
    "S_t=max(0,S_{t-1}+x_t-k) rewritten to its exact closed form "
    "cum_t - min(0, running_min(cum)) — two frame functions on ONE "
    "keyed window, fully distributed, integer-cent exact on both engines",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = cusum_changepoint(
        ev,
        ["user_id"],
        "ts",
        "value",
        drift_cents=550,
        threshold_cents=2500,
        order_tiebreak=["event_id"],
    )
    return out.select("event_id", "user_id", "cusum", "alarm")


@register(
    "q_autocorrelation",
    oracle=autocorrelation_sql(
        "SELECT event_id, user_id % 16 AS series, ts, value FROM events",
        ["series"],
        "ts",
        "value",
        max_lag=5,
        order_tiebreak=["event_id"],
    ),
    description="sample autocorrelation per series at lags 1..5 (burstiness/"
    "periodicity profile): all lag columns in ONE keyed window pass, "
    "row-local inline stack, one aggregation on the (series, lag) composite "
    "with exact DECIMAL(38,0)/HUGEINT cross sums and a fixed double-op "
    "Pearson finish — bit-identical across engines, no series self-join",
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 16).alias("series"), "ts", "value"
    )
    return autocorrelation(
        ev, ["series"], "ts", "value", max_lag=5, order_tiebreak=["event_id"]
    )


from cosmos_xenna_spark.operators.timeseries import (  # noqa: E402
    resample_ffill,
    resample_ffill_sql,
)


@register(
    "q_resample_ffill",
    oracle=resample_ffill_sql(
        "SELECT user_id, ts, value, event_id FROM events",
        ["user_id"],
        "ts",
        "value",
        step_secs=21600,
        order_tiebreak=["event_id"],
    ),
    description="resample each user's series onto a regular 6h grid with "
    "forward-fill (the distributed resample().ffill()): union-spine trick — "
    "grid rows union with observations, ONE keyed window forward-fills via "
    "last IGNORE NULLS, no as-of join; per-key spine spans only the active "
    "range so the fill is total",
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    return resample_ffill(
        ev, ["user_id"], "ts", "value", step_secs=21600, order_tiebreak=["event_id"]
    )


from cosmos_xenna_spark.operators.timeseries import (  # noqa: E402
    rolling_median,
    rolling_median_sql,
)


@register(
    "q_rolling_median",
    oracle=(
        "SELECT event_id, user_id, rolling_median FROM ("
        + rolling_median_sql(
            "SELECT event_id, user_id, ts, value FROM events",
            ["user_id"],
            "ts",
            "value",
            window_rows=7,
            order_tiebreak=["event_id"],
        )
        + ")"
    ),
    description="exact rolling median over each user's trailing 7 events "
    "(robust smoother): cent-quantized frame rides one keyed window as "
    "collect_list, row-local sorted middle pick with FLOOR'd index "
    "divisions (cast-rounding differs between engines) — O(window) state",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = rolling_median(
        ev, ["user_id"], "ts", "value", window_rows=7, order_tiebreak=["event_id"]
    )
    return out.select("event_id", "user_id", "rolling_median")


from cosmos_xenna_spark.operators.timeseries import (  # noqa: E402
    sax_motifs,
    sax_motifs_sql,
)

# PAA input: one segment per (user, day), integer mean cents —
# computed identically on both sides so the motif operator's contract
# starts from the same exact table
_PAA_SQL = """
    SELECT user_id,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
           SUM(CAST(FLOOR(value * 100) AS BIGINT))
             // COUNT(*) AS avg_cents
    FROM events GROUP BY 1, 2
"""


@register(
    "q_sax_motifs",
    oracle=sax_motifs_sql(
        _PAA_SQL,
        ["user_id"],
        "day",
        "avg_cents",
        breakpoints=[12000, 24000, 36000],
        motif_len=3,
        min_count=2,
    ),
    description="SAX symbolic motif mining over per-user daily series: "
    "integer PAA (daily mean cents) -> fixed-breakpoint 4-letter alphabet "
    "-> consecutive-segment 3-motifs counted corpus-wide — which shapes "
    "recur across all series, no float distances anywhere; one keyed "
    "lead window + one bounded count",
)
def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    paa = (
        ev.groupBy(
            "user_id",
            F.expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')")
            .cast("bigint")
            .alias("day"),
        )
        .agg(
            F.expr(
                "sum(CAST(FLOOR(value * 100) AS BIGINT)) div count(*)"
            ).alias("avg_cents")
        )
    )
    return sax_motifs(
        paa,
        ["user_id"],
        "day",
        "avg_cents",
        breakpoints=[12000, 24000, 36000],
        motif_len=3,
        min_count=2,
    )


from cosmos_xenna_spark.operators.timeseries import (  # noqa: E402
    business_days_between,
    business_days_between_sql,
    run_length_encode,
    run_length_encode_sql,
)


@register(
    "q_business_days",
    oracle=f"""
    SELECT o_orderkey,
           {business_days_between_sql("o_orderdate", "l_shipdate")} AS biz_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_linenumber = 1
    """,
    description="business days (Mon-Fri) from order to first-line ship "
    "date: closed-form weekday prefix arithmetic (full weeks x5 + clamped "
    "weekday offset) — no calendar table, no explode, exact for any date "
    "pair; one broadcast-joined scan",
)
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linenumber") == 1
    ).select("l_orderkey", "l_shipdate")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            "o_orderkey",
            business_days_between("o_orderdate", "l_shipdate").alias(
                "biz_days"
            ),
        )
    )


@register(
    "q_event_rle",
    oracle=run_length_encode_sql(
        "SELECT user_id, event_id, ts, event_type FROM events",
        ["user_id"],
        "ts",
        "event_type",
        "event_id",
    ),
    description="run-length encoding of each user's event-type sequence "
    "(one row per maximal equal-value run, with run index / length / "
    "start): the sequence-compression reduction — change-flag + running-"
    "sum run ids, two keyed windows, null-safe value comparison",
)
def q_event_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    return run_length_encode(ev, ["user_id"], "ts", "event_type", "event_id")
