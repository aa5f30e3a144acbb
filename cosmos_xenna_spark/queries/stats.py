"""Distribution/association statistics queries with DuckDB oracles:
equal-width histogram, decimal-exact grouped correlation/covariance,
z-score outlier flagging."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.stats import (
    grouped_moments,
    grouped_moments_sql,
    histogram2d,
    histogram2d_sql,
    grouped_linreg,
    grouped_linreg_sql,
    grouped_mode,
    grouped_mode_sql,
    chi_squared,
    chi_squared_sql,
    rolling_zscore,
    trimmed_mean,
    trimmed_mean_sql,
    rolling_zscore_sql,
    winsorize,
    winsorize_sql,
    grouped_corr,
    grouped_corr_sql,
    histogram,
    histogram_sql,
    ks_two_sample,
    ks_two_sample_sql,
    distribution_drift,
    distribution_drift_sql,
    mad_outliers,
    mad_outliers_sql,
    quantile_bin,
    quantile_bin_sql,
    quantile_profile,
    quantile_profile_sql,
    outlier_zscore,
    weighted_median,
    weighted_median_sql,
)
from cosmos_xenna_spark.queries import register

_H = dict(col="l_extendedprice", lo=900.0, hi=105000.0, nbins=20)


@register(
    "q_histogram",
    oracle=histogram_sql("lineitem", _H["col"], _H["lo"], _H["hi"], _H["nbins"]),
    description="equal-width 20-bin histogram of l_extendedprice "
    "(row-local bucketing, map-side partial counts)",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return histogram(li, _H["col"], _H["lo"], _H["hi"], _H["nbins"])


@register(
    "q_corr_covar",
    oracle=grouped_corr_sql("lineitem", ["l_returnflag"], "l_quantity", "l_extendedprice"),
    description="per-group Pearson correlation + sample covariance from "
    "decimal-exact moment sums (one scan, one shuffle)",
)
def q_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return grouped_corr(li, ["l_returnflag"], "l_quantity", "l_extendedprice")


_Z_THRESH = 1.5


@register(
    "q_outlier_zscore",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS STRING)
                  AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST((CAST(l_extendedprice AS DECIMAL(19,4))
                                 * CAST(l_extendedprice AS DECIMAL(19,4)))
                                AS DECIMAL(38,8))) AS STRING) AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber, l.l_returnflag,
           (CAST(l.l_extendedprice AS DOUBLE) - sx / n)
             / sqrt((sxx - sx * sx / n) / (n - 1.0)) AS z
    FROM lineitem l JOIN m USING (l_returnflag)
    WHERE abs((CAST(l.l_extendedprice AS DOUBLE) - sx / n)
              / sqrt((sxx - sx * sx / n) / (n - 1.0))) >= {_Z_THRESH}
    """,
    description="per-group z-score outliers (|z| >= 2) from exact moments; "
    "tiny stats table broadcast back, fact side never shuffles",
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    flagged = outlier_zscore(li, ["l_returnflag"], "l_extendedprice", threshold=_Z_THRESH)
    return flagged.filter(F.col("is_outlier")).select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        "l_returnflag",
        "z",
    )


@register(
    "q_robust_scale",
    oracle="""
    WITH q AS (
      SELECT lang,
             quantile_cont(n_chars, 0.5) AS med,
             quantile_cont(n_chars, 0.75) - quantile_cont(n_chars, 0.25) AS iqr
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id,
           (CAST(d.n_chars AS DOUBLE) - med) / nullif(iqr, 0.0) AS robust_z
    FROM documents d JOIN q USING (lang)
    """,
    description="median/IQR robust feature scaling per group (exact "
    "interpolated quantiles; tiny stats table broadcast back, facts never "
    "shuffle)",
)
def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.stats import robust_scale

    docs = load_table(spark, sf_dir, "documents")
    return robust_scale(docs, ["lang"], "n_chars").select("doc_id", "robust_z")


@register(
    "q_weighted_median",
    oracle=weighted_median_sql("lineitem", ["l_returnflag"], "l_quantity", "l_extendedprice", "wmedian"),
    description="exact weighted median (quantity weighted by price) per "
    "group — distinct-value compression first (map-side combine), so the "
    "window sorts <= 50 rows per group at any corpus size",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return weighted_median(li, ["l_returnflag"], "l_quantity", "l_extendedprice")


_MAD_K = 2.0


@register(
    "q_mad_outliers",
    oracle=mad_outliers_sql("documents", ["lang"], "n_chars", _MAD_K, "doc_id, lang, n_chars"),
    description="median-absolute-deviation outlier flags per language "
    "(fully robust companion to z-scores) — two tiny quantile tables "
    "broadcast back, facts never shuffle",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mad_outliers(docs, ["lang"], "n_chars", k=_MAD_K).select(
        "doc_id", "lang", "n_chars", "abs_dev", "mad", "is_outlier"
    )


@register(
    "q_quantile_bin",
    oracle=quantile_bin_sql("documents", ["lang"], "n_chars", 4, "doc_id, lang, n_chars"),
    description="equal-frequency quartile binning per language — "
    "broadcast exact-quantile thresholds, row-local bin ids, facts "
    "never shuffle (no ntile window)",
)
def q_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quantile_bin(docs, ["lang"], "n_chars", nbins=4).select(
        "doc_id", "lang", "n_chars", "bin"
    )


_DRIFT_A = "SELECT * FROM documents WHERE doc_id % 2 = 0"
_DRIFT_B = "SELECT * FROM documents WHERE doc_id % 2 = 1"


@register(
    "q_distribution_drift",
    oracle=distribution_drift_sql(_DRIFT_A, _DRIFT_B, "lang"),
    description="total-variation distance between two corpus slices' "
    "language distributions — the log-free drift statistic; integer "
    "numerator summed exactly (order-independent), one final division",
)
def q_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return distribution_drift(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "lang",
    )


@register(
    "q_quantile_profile",
    oracle=quantile_profile_sql("documents", ["lang"], "n_chars"),
    description="per-group distribution profile (min/p25/p50/p75/max + "
    "count) in one aggregation pass — exact quarter quantiles, "
    "engine-exact for integer features",
)
def q_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quantile_profile(docs, ["lang"], "n_chars")


@register(
    "q_ks_test",
    oracle=ks_two_sample_sql(_DRIFT_A, _DRIFT_B, ["lang"], "n_chars"),
    description="per-language two-sample Kolmogorov-Smirnov statistic "
    "between corpus slices — numeric distribution-shift test; exact "
    "integer ECDF comparison over distinct-value-compressed counts, "
    "group-keyed windows only",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ks_two_sample(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        ["lang"],
        "n_chars",
    )


@register(
    "q_winsorize",
    oracle=(
        "SELECT doc_id, lang, clip_lo, clip_hi, v_clipped FROM ("
        + winsorize_sql("documents", ["lang"], "n_chars", 0.25, 0.75)
        + ")"
    ),
    description="per-language winsorization: clip doc length to the exact "
    "[p25, p75] quantiles (quarter quantiles of integers are engine-exact); "
    "bounds broadcast back, facts never shuffle, no rank window",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return winsorize(docs, ["lang"], "n_chars", 0.25, 0.75).select(
        "doc_id", "lang", "clip_lo", "clip_hi", "v_clipped"
    )


@register(
    "q_rolling_zscore",
    oracle=(
        "SELECT event_id, user_id, zscore FROM ("
        + rolling_zscore_sql(
            "SELECT event_id, user_id, ts, value FROM events",
            ["user_id"],
            "ts",
            "value",
            window_rows=20,
            order_tiebreak=["event_id"],
        )
        + ")"
    ),
    description="trailing-window anomaly score per user: z-score vs the "
    "preceding 20 events (exclusive) — dyadic-exact cents quantization makes "
    "the frame moments exact integers, so both engines agree bit-for-bit; "
    "one keyed window, frame-bounded state",
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = rolling_zscore(ev, ["user_id"], "ts", "value", 20, order_tiebreak=["event_id"])
    return out.select("event_id", "user_id", "zscore")


@register(
    "q_trimmed_mean",
    oracle=trimmed_mean_sql("documents", ["lang"], "n_chars", 0.25, 0.75),
    description="per-language interquartile (trimmed) mean of doc length — "
    "outlier-robust location from exact quarter quantiles broadcast back; "
    "decimal-exact in-band mean, facts never rank-windowed",
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return trimmed_mean(docs, ["lang"], "n_chars", 0.25, 0.75)


@register(
    "q_chi_squared",
    oracle=chi_squared_sql("documents", "lang", "source"),
    description="chi-squared independence contingency table (lang x source): "
    "one fact aggregation, window marginals over the domain-bounded cells "
    "frame, broadcast grand total; per-cell contributions are a fixed "
    "double-op sequence on exact integers (bit-deterministic) — the float "
    "TOTAL is deliberately not emitted",
)
def q_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chi_squared(docs, "lang", "source")


@register(
    "q_linreg_per_group",
    oracle=grouped_linreg_sql(
        "(SELECT o_custkey % 10 AS bucket, CAST(o_orderkey % 1000 AS DOUBLE) AS x, "
        "CAST(o_totalprice AS DOUBLE) AS y FROM orders)",
        ["bucket"], "x", "y",
    ),
    description="per-group simple OLS (slope/intercept/R^2) from decimal-"
    "exact moment sums — one scan, one shuffle, order-independent where "
    "the built-in regr_* incremental co-moments are not; zero-variance "
    "groups emit NULLs",
)
def q_linreg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 10).alias("bucket"),
        (F.col("o_orderkey") % 1000).cast("double").alias("x"),
        F.col("o_totalprice").cast("double").alias("y"),
    )
    return grouped_linreg(orders, ["bucket"], "x", "y")


@register(
    "q_mode_per_group",
    oracle=grouped_mode_sql("events", ["user_id"], "event_type"),
    description="most frequent event type per user with a total tiebreak "
    "(max count, then smallest value) via the portable padded-key arg-min "
    "— two fine-grained aggregations, engine-independent where built-in "
    "mode() tie behavior is not",
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return grouped_mode(ev, ["user_id"], "event_type")


@register(
    "q_histogram2d",
    oracle=histogram2d_sql(
        "(SELECT value, CAST(extract(hour FROM ts) AS DOUBLE) AS hr FROM events)",
        "value", 0.0, 10.0, 8,
        "hr", 0.0, 24.0, 24,
    ),
    description="2-D density heatmap: (value x hour-of-day) equal-width "
    "bin grid over events — both bucket ids row-local, one scan with "
    "map-side partials, edge-clamped; bit-identical bucket arithmetic "
    "on both engines",
)
def q_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "value", F.hour("ts").cast("double").alias("hr")
    )
    return histogram2d(ev, "value", 0.0, 10.0, 8, "hr", 0.0, 24.0, 24)


@register(
    "q_moments_per_group",
    oracle=grouped_moments_sql("documents", ["lang"], "n_chars"),
    description="per-language population skewness + excess kurtosis of "
    "document length from exact DECIMAL(38,0)/HUGEINT power sums (one "
    "scan, one shuffle, fixed double-op finish mirrored verbatim in both "
    "engines — bit-exact and partitioning-independent)",
)
def q_moments_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return grouped_moments(docs, ["lang"], "n_chars")


from cosmos_xenna_spark.operators.stats import (  # noqa: E402
    quantile_normalize,
    quantile_normalize_sql,
)


@register(
    "q_quantile_normalize",
    oracle=(
        "SELECT doc_id, lang, n_chars, value_qnorm FROM ("
        + quantile_normalize_sql(
            "SELECT doc_id, lang, n_chars FROM documents",
            ["lang"],
            "n_chars",
            ["doc_id"],
        )
        + ")"
    ),
    description="cross-group quantile normalization: each document's length "
    "mapped to the GLOBAL length at the same quantile position (batch-effect "
    "correction before percentile gates) — exact integer rank arithmetic, "
    "within-group rank+count on one keyed window exchange, distributed "
    "quantile-bucketed global rank (never a single-partition window), one "
    "equi-join on the computed rank",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = quantile_normalize(docs, ["lang"], "n_chars", ["doc_id"])
    return out.select("doc_id", "lang", "n_chars", "value_qnorm")


from cosmos_xenna_spark.operators.stats import (  # noqa: E402
    target_encode_loo,
    target_encode_loo_sql,
)


@register(
    "q_target_encode_loo",
    oracle=(
        "SELECT doc_id, source, te_loo FROM ("
        + target_encode_loo_sql(
            "SELECT doc_id, source, n_chars FROM documents", "source", "n_chars", scale=1
        )
        + ")"
    ),
    description="leave-one-out target encoding of the source column against "
    "document length ((sum_cat - own) / (n_cat - 1) — the leakage-safe "
    "high-cardinality encoder; own-row exclusion is the guard): one "
    "category aggregation, tiny sums table broadcast back, facts never "
    "shuffle; singleton categories emit NULL",
)
def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = target_encode_loo(docs, "source", "n_chars", scale=1)
    return out.select("doc_id", "source", "te_loo")


from cosmos_xenna_spark.operators.stats import (  # noqa: E402
    gini_concentration,
    gini_concentration_sql,
    simpson_diversity,
    simpson_diversity_sql,
)


@register(
    "q_simpson_diversity",
    oracle=simpson_diversity_sql(
        "SELECT user_id, event_type FROM events", ["user_id"], "event_type"
    ),
    description="per-user Simpson concentration over event types in exact "
    "ppm (two-draw collision probability): the log-free diversity index — "
    "two map-side-combinable aggregations, no windows, bigint-exact",
)
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return simpson_diversity(ev, ["user_id"], "event_type")


@register(
    "q_gini_concentration",
    oracle=gini_concentration_sql(
        """SELECT CAST(c.c_nationkey AS BIGINT) AS nation, o.o_orderkey AS okey,
                  CAST(FLOOR(o.o_totalprice) AS BIGINT) AS price_usd
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
        ["nation"],
        "price_usd",
        "okey",
    ),
    description="per-nation Gini coefficient of order value in exact ppm "
    "(revenue concentration): one keyed rank window + one aggregation, "
    "all-bigint closed form with deterministic tiebreak",
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.col("o_orderkey").alias("okey"),
        F.floor("o_totalprice").cast("bigint").alias("price_usd"),
    )
    return gini_concentration(joined, ["nation"], "price_usd", "okey")


from cosmos_xenna_spark.operators.stats import (  # noqa: E402
    cohens_kappa,
    cohens_kappa_sql,
    smoothed_rate,
    smoothed_rate_sql,
    theil_sen_slope,
    theil_sen_slope_sql,
)

# per-user daily event counts: small bounded groups (x = day index,
# y = count), the regime Theil-Sen's pairwise median is built for
_DAILY_COUNTS_SQL = """
    SELECT user_id,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
"""


@register(
    "q_theil_sen",
    oracle=theil_sen_slope_sql(
        _DAILY_COUNTS_SQL,
        ["user_id"],
        "day",
        "n",
        "day",
        max_group_rows=256,
    ),
    description="per-user Theil-Sen trend of daily event counts: the "
    "MEDIAN pairwise slope (1e6*dy div dx bigints, lower median) — robust "
    "to ~29% outlier days where OLS is not; group-local pair join bounded "
    "by max_group_rows=256, one shuffle on the user key",
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return theil_sen_slope(
        daily, ["user_id"], "day", "n", "day", max_group_rows=256
    )


from cosmos_xenna_spark.queries.text import _langid_expr_sql  # noqa: E402


@register(
    "q_cohens_kappa",
    oracle=cohens_kappa_sql(
        f"SELECT lang AS la, {_langid_expr_sql()} AS lb FROM documents",
        "la",
        "lb",
    ),
    description="Cohen's kappa between the labeled lang column and the "
    "n-gram langid heuristic, exact ppm (chance-corrected agreement in "
    "decimal(38) — 1e6*(n*agree - sum(row*col)) div (n^2 - sum(row*col))): "
    "the trust-the-classifier gate before filtering on its output; one "
    "confusion-count shuffle, marginals derived from it",
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.text import langid_col

    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("la"), langid_col("text").alias("lb")
    )
    return cohens_kappa(pred, "la", "lb")


@register(
    "q_smoothed_domain_rate",
    oracle=smoothed_rate_sql(
        "SELECT source, CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS ok"
        " FROM documents",
        ["source"],
        "ok",
        prior_ppm=500_000,
        prior_weight=50,
    ),
    description="Dirichlet-smoothed per-source quality pass rate, exact "
    "ppm: (1e6*passes + prior*weight) div (n + weight) — Bayesian "
    "shrinkage so a 3-doc domain cannot outrank a 10^6-doc domain on a "
    "lucky 100%; one aggregation, all bigint",
)
def q_smoothed_domain_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gated = docs.select(
        "source",
        (F.col("n_chars") >= 200).cast("int").alias("ok"),
    )
    return smoothed_rate(
        gated, ["source"], "ok", prior_ppm=500_000, prior_weight=50
    )


@register(
    "q_supplier_reliability",
    oracle=smoothed_rate_sql(
        "SELECT l_suppkey, CASE WHEN l_returnflag <> 'R'"
        " THEN 1 ELSE 0 END AS ok FROM lineitem",
        ["l_suppkey"],
        "ok",
        prior_ppm=500_000,
        prior_weight=100,
    ),
    description="Dirichlet-smoothed non-return rate per supplier over the "
    "lineitem fact (returnflag <> 'R'): the smoothed_rate operator on the "
    "big table — one fact-table aggregation, all bigint, low-volume "
    "suppliers shrink toward the 50% prior",
)
def q_supplier_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.col("l_returnflag") != "R").cast("int").alias("ok"),
    )
    return smoothed_rate(
        li, ["l_suppkey"], "ok", prior_ppm=500_000, prior_weight=100
    )


from cosmos_xenna_spark.operators.hll import (  # noqa: E402
    hll_rollup,
    hll_rollup_sql,
)


@register(
    "q_hll_rollup",
    oracle=hll_rollup_sql(
        "SELECT event_type, user_id FROM events", "event_type", "user_id"
    ),
    description="integer-exact HyperLogLog rollup: per-event-type distinct-"
    "user registers (md5-hash buckets, rho = 53 - bit_length) merged by MAX "
    "into the ALL row — the mergeable-sketch property demonstrated against "
    "the exact distinct riding along; the dyadic-rational estimate "
    "(2^-rho terms scaled 2^53) is bigint arithmetic end-to-end, so the "
    "APPROXIMATE sketch has an EXACT cross-engine oracle",
)
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return hll_rollup(ev, "event_type", "user_id")


from cosmos_xenna_spark.operators.stats import cramers_v, cramers_v_sql  # noqa: E402


@register(
    "q_cramers_v",
    oracle=cramers_v_sql("documents", "lang", "source"),
    description="Cramer's V association strength (lang x source) — the "
    "chi-squared total q_chi_squared withholds, made order-independent "
    "by flooring each cell's milli-contribution to an integer BEFORE "
    "the sum (exact DECIMAL38/HUGEINT per cell, deterministic under "
    "any partitioning); single fixed-IEEE sqrt finish; one fact "
    "aggregation, windows on the domain-bounded cells frame, "
    "single-row output",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return cramers_v(docs, "lang", "source")
