"""Data-quality expectation-suite query: the whole declarative rule
set evaluated in one scan, compared against a per-rule UNION ALL
oracle.  The suite mixes passing and failing rules so both branches of
``passed`` are exercised."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.dq import (
    fk_integrity,
    fk_integrity_sql,
    fd_violations,
    fd_violations_sql,
    table_profile,
    table_profile_sql,
    Expectation,
    evaluate_expectations,
    expectations_oracle_sql,
    k_anonymity_violations,
    key_skew_report,
    key_skew_report_sql,
)
from cosmos_xenna_spark.queries import register

LINEITEM_SUITE = [
    Expectation("orderkey_present", "l_orderkey", "not_null"),
    Expectation("qty_in_range", "l_quantity", "in_range", lo=1, hi=50),
    Expectation("tax_tight_range", "l_tax", "in_range", lo=0.0, hi=0.05),  # fails
    Expectation("returnflag_domain", "l_returnflag", "in_set", values=("A", "N", "R")),
    Expectation("linestatus_shape", "l_linestatus", "matches", pattern="^[OF]$"),
    Expectation("orderkey_unique", "l_orderkey", "unique"),  # fails: 1 row per line
]


@register(
    "q_dq_expectations",
    oracle=expectations_oracle_sql("lineitem", LINEITEM_SUITE),
    description="declarative DQ suite (not_null/in_range/in_set/regex/unique) "
    "compiled into one aggregation pass; one output row per rule",
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return evaluate_expectations(li, LINEITEM_SUITE)


_K = 5


@register(
    "q_k_anonymity",
    oracle=f"""
    SELECT lang, source, n_chars // 25 AS size_band, COUNT(*) AS n_rows
    FROM documents
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < {_K}
    """,
    description="k-anonymity audit: quasi-identifier combinations held by "
    "fewer than k rows (one shuffle on the quasi columns; output is the "
    "rare combinations, not the data)",
)
def q_k_anonymity(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "size_band", F.expr("n_chars div 25")
    )
    return k_anonymity_violations(docs, ["lang", "source", "size_band"], _K)


@register(
    "q_skew_report",
    oracle=key_skew_report_sql("events", ["user_id"], 10),
    description="key-skew pre-flight: the 10 heaviest join/agg key "
    "groups with exact corpus shares — TakeOrdered over map-side-"
    "combined counts, never a global sort (pairs with operators/skew.py "
    "salting)",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return key_skew_report(ev, ["user_id"], top_n=10)


@register(
    "q_fd_violations",
    oracle=fd_violations_sql(
        "(SELECT o_custkey, o_orderpriority, o_orderstatus FROM orders) t",
        ["o_custkey", "o_orderpriority"],
        "o_orderstatus",
    ),
    description="functional-dependency audit: (custkey, priority) pairs that "
    "map to more than one order status, with witness min/max values — one "
    "count-distinct aggregation pass on the determinant key",
)
def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderstatus"
    )
    return fd_violations(orders, ["o_custkey", "o_orderpriority"], "o_orderstatus")


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


@register(
    "q_table_profile",
    oracle=table_profile_sql("orders", _PROFILE_COLS),
    description="one-pass table profiler: per-column null count / exact "
    "distinct count / min / max for five orders columns in a single scan, "
    "unpivoted to long format with stack (no driver loop)",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return table_profile(orders, _PROFILE_COLS)


@register(
    "q_fk_integrity",
    oracle=fk_integrity_sql(
        [
            ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
            ("events_user", "events", "user_id", "customer", "c_custkey"),
        ]
    ),
    description="referential-integrity audit across three FK relations: "
    "orphan child rows counted via distinct-parent-key anti-joins (NULL "
    "FKs exempt, counted separately); one tiny summary row per relation, "
    "exact integer ppm — the Bloom prefilter is the web-scale slot-in",
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    return fk_integrity(
        [
            ("lineitem_orders", li, "l_orderkey", orders, "o_orderkey"),
            ("orders_customer", orders, "o_custkey", cust, "c_custkey"),
            ("events_user", ev, "user_id", cust, "c_custkey"),
        ]
    )


from cosmos_xenna_spark.operators.dq import benford_test, benford_test_sql  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


@register(
    "q_benford_digits",
    oracle=benford_test_sql(
        "SELECT l_returnflag, l_extendedprice FROM lineitem",
        ["l_returnflag"],
        "l_extendedprice",
    ),
    description="Benford's-law first-digit conformance of extended price per "
    "return flag (fabricated-data / unit-mixup screen): one aggregation on "
    "(group, digit) with map-side partials, dense 9-digit spine built from "
    "the aggregated table (facts never join the spine), fixed double-op "
    "chi-squared contributions on exact integer counts",
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    return benford_test(li, ["l_returnflag"], "l_extendedprice")


from cosmos_xenna_spark.operators.dq import anonymity_ladder, anonymity_ladder_sql  # noqa: E402

_LADDER_LEVELS = [
    ["lang", "source", "band25"],
    ["lang", "source", "band100"],
    ["lang", "source"],
    ["lang"],
]


@register(
    "q_anonymity_ladder",
    oracle=anonymity_ladder_sql(
        "SELECT lang, source, n_chars // 25 AS band25, n_chars // 100 AS band100"
        " FROM documents",
        _LADDER_LEVELS,
        k=5,
    ),
    description="k-anonymity generalization ladder: four quasi-identifier "
    "generalization levels profiled in ONE GROUPING SETS pass (one shuffle, "
    "map-side partials — the ladder costs the same scan as one level); per "
    "level: group count, under-k groups, rows at risk — the privacy-utility "
    "readout that picks the minimal safe generalization",
)
def q_anonymity_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.expr("n_chars div 25").alias("band25"),
        F.expr("n_chars div 100").alias("band100"),
    )
    return anonymity_ladder(docs, _LADDER_LEVELS, k=5)


from cosmos_xenna_spark.operators.dq import schema_drift, schema_drift_sql  # noqa: E402

_DRIFT_COLS = ["o_orderstatus", "o_totalprice", "o_orderpriority", "o_custkey"]
_DRIFT_OLD = "SELECT * FROM orders WHERE o_orderdate < DATE '1995-01-01'"
_DRIFT_NEW = "SELECT * FROM orders WHERE o_orderdate >= DATE '1995-01-01'"


@register(
    "q_schema_drift",
    oracle=schema_drift_sql(_DRIFT_OLD, _DRIFT_NEW, _DRIFT_COLS),
    description="profile drift between two table slices (null-rate delta "
    "ppm, distinct-cardinality delta, min/max boundary movement per column) "
    "— two one-scan profiles joined on the column-count-sized name key; the "
    "pre-flight that catches upstream semantic changes before training",
)
def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderdate") < "1995-01-01")
    new = orders.filter(F.col("o_orderdate") >= "1995-01-01")
    return schema_drift(old, new, _DRIFT_COLS)


from cosmos_xenna_spark.operators.dq import (  # noqa: E402
    json_validity,
    json_validity_sql,
)


@register(
    "q_json_validity",
    oracle=json_validity_sql(
        "SELECT event_type, props FROM events",
        ["event_type"],
        "props",
        "k",
    ),
    description="semi-structured ingest gate: per event type, how many "
    "props payloads parse as JSON objects, how many carry key 'k', and "
    "that key's bigint min/max — one scan, one tiny groupBy; NULL-for-"
    "invalid try-parse semantics mirrored in both engines",
)
def q_json_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    return json_validity(ev, ["event_type"], "props", "k")


from cosmos_xenna_spark.operators.dq import (  # noqa: E402
    l_diversity,
    l_diversity_sql,
    t_closeness,
    t_closeness_sql,
)

_SENS_TABLE = "SELECT lang, source, n_chars // 25 AS band FROM documents"


@register(
    "q_l_diversity",
    oracle=l_diversity_sql(_SENS_TABLE, ["lang", "source"], "band", 3),
    description="l-diversity privacy audit: per quasi-identifier group, "
    "distinct sensitive values + top-value share ppm + distinct-l pass "
    "flag — the homogeneity-attack screen k-anonymity misses; two-stage "
    "aggregation (one shuffle on (quasi, sensitive) with map-side "
    "partials), output one row per quasi group",
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", F.expr("n_chars div 25").alias("band")
    )
    return l_diversity(docs, ["lang", "source"], "band", 3)


@register(
    "q_t_closeness",
    oracle=t_closeness_sql(_SENS_TABLE, ["lang", "source"], "band", 300000),
    description="t-closeness privacy audit: per quasi group, exact-integer "
    "total-variation distance (ppm) between the group's sensitive-value "
    "distribution and the corpus-wide one — the distribution-skew leak "
    "l-diversity misses; sparse (group, value) frame (absent values folded "
    "in arithmetically, no dense spine), vocabulary-bounded global "
    "distribution broadcast, single-row corpus total as the allowlisted "
    "one-row broadcast",
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "source", F.expr("n_chars div 25").alias("band")
    )
    return t_closeness(docs, ["lang", "source"], "band", 300000)
