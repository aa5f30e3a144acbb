"""Corpus-curation queries with DuckDB oracles: per-domain capping,
percentile quality gates, corpus-wide heavy hitters."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.curation import (
    filter_funnel,
    filter_funnel_sql,
    domain_cap,
    domain_cap_sql,
    heavy_hitters,
    heavy_hitters_sql,
    percentile_gate,
    percentile_gate_sql,
)
from cosmos_xenna_spark.queries import register

_CAP = 10
_DOC_COLS = "doc_id, lang, source, n_chars"


@register(
    "q_domain_cap",
    oracle=domain_cap_sql("documents", "source", "doc_id", _CAP, _DOC_COLS),
    description=f"deterministic per-domain cap: keep at most {_CAP} docs per "
    "source, chosen by portable hash order — skew-safe two-stage window "
    "(salted pre-cap bounds the final per-domain sort)",
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return domain_cap(docs, "source", "doc_id", cap=_CAP).select(
        "doc_id", "lang", "source", "n_chars"
    )


# 0.25 — not an arbitrary choice: quarter quantiles of integer scores
# are exact binary fractions in ANY interpolation formula, so the
# keep/drop boundary is bit-identical across engines (0.2 would put a
# non-representable factor into the interpolation).
_GATE_PCT = 0.25


@register(
    "q_percentile_gate",
    oracle=percentile_gate_sql("documents", ["lang"], "n_chars", _GATE_PCT, _DOC_COLS),
    description="quality gate: drop the bottom quartile of docs per language "
    "by score — per-group exact quantile broadcast back, facts never shuffle "
    "(no rank window)",
)
def q_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return percentile_gate(docs, ["lang"], "n_chars", pct=_GATE_PCT).select(
        "doc_id", "lang", "source", "n_chars"
    )


_HH_PPM = 5000


@register(
    "q_heavy_hitters",
    oracle=heavy_hitters_sql("documents", "text", _HH_PPM),
    description="corpus-wide heavy hitters: words at >= 0.5% of all tokens "
    "(stopword/boilerplate discovery) — map-side-combined word counts + "
    "broadcast total; exact integer ppm threshold",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return heavy_hitters(docs, "text", min_ppm=_HH_PPM)


@register(
    "q_heavy_hitters_sketch",
    oracle=heavy_hitters_sql("documents", "text", _HH_PPM),
    description="heavy hitters via per-partition Misra-Gries candidate "
    "sketches + exact verification of candidates only — the token tail "
    "never shuffles, yet the output is bit-identical to the exact "
    "operator (same oracle)",
)
def q_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.curation import heavy_hitters_sketch

    docs = load_table(spark, sf_dir, "documents")
    return heavy_hitters_sketch(docs, "text", min_ppm=_HH_PPM)


_FUNNEL_GATES_SQL = [
    ("min_length", "n_chars >= 120"),
    ("known_lang", "lang IN ('en', 'de', 'fr', 'es')"),
    ("trusted_source", "source NOT IN ('src17', 'src18', 'src19')"),
]


@register(
    "q_filter_funnel",
    oracle=filter_funnel_sql("documents", _FUNNEL_GATES_SQL),
    description="curation-cascade audit: cumulative survival counts through "
    "an ordered gate list (length -> language -> source trust) — the whole "
    "funnel report is ONE aggregation pass with map-side partials, "
    "NULL-as-fail semantics",
)
def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return filter_funnel(
        docs,
        [
            ("min_length", F.col("n_chars") >= 120),
            ("known_lang", F.col("lang").isin("en", "de", "fr", "es")),
            ("trusted_source", ~F.col("source").isin("src17", "src18", "src19")),
        ],
    )


from cosmos_xenna_spark.operators.curation import skyline2d, skyline2d_sql  # noqa: E402


@register(
    "q_skyline",
    oracle=skyline2d_sql(
        "SELECT o_orderkey, CAST(o_totalprice * 100 AS BIGINT) AS price_c,"
        " CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS odate_s"
        " FROM orders",
        "price_c",
        "odate_s",
    ),
    description="2-D skyline / Pareto frontier (orders not dominated on "
    "(value, recency)): distributed via the skyline closure property — "
    "per-salt-bucket staircase frontiers (Arrow kernel, sort + linear "
    "scan, never O(n^2)), then the same kernel over the frontier-sized "
    "survivor union; oracle is the quadratic NOT-EXISTS dominance "
    "definition",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).cast("bigint").alias("odate_s"),
    )
    return skyline2d(orders, "price_c", "odate_s")


from cosmos_xenna_spark.operators.curation import (  # noqa: E402
    boilerplate_prefix,
    boilerplate_prefix_sql,
    template_mining,
    template_mining_sql,
)


@register(
    "q_boilerplate_prefix",
    oracle=boilerplate_prefix_sql(
        "SELECT source, text FROM documents",
        group_col="source",
        text_col="text",
        prefix_len=16,
        min_share_ppm=0,
    ),
    description="boilerplate-header detection: per source, the dominant "
    "16-char document prefix and its exact share ppm (licence banners / "
    "nav bars / template preambles repeat verbatim at doc start) — two "
    "group-key shuffles, prefix never leaves the row; deterministic "
    "count-desc/prefix-asc winner",
)
def q_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return boilerplate_prefix(
        docs, group_col="source", text_col="text", prefix_len=16, min_share_ppm=0
    )


@register(
    "q_template_mining",
    oracle=template_mining_sql(
        "SELECT source, text FROM documents",
        group_col="source",
        text_col="text",
        top_k=3,
        max_len=48,
    ),
    description="Drain-style template mining, simplified: digit runs in "
    "the first 48 chars masked to '#', identical templates counted per "
    "source, top-3 kept (count desc, template asc) — surfaces machine-"
    "generated sources that should be parsed, not language-modeled",
)
def q_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return template_mining(
        docs, group_col="source", text_col="text", top_k=3, max_len=48
    )


from cosmos_xenna_spark.operators.curation import (  # noqa: E402
    pareto_cut,
    pareto_cut_sql,
)


@register(
    "q_pareto_cut",
    oracle=pareto_cut_sql(
        "SELECT lang, source, n_chars, doc_id FROM documents",
        ["lang"],
        "n_chars",
        "doc_id",
        target_ppm=800_000,
    ),
    description="Pareto concentration cut per language: minimum number of "
    "documents (heaviest first) carrying 80% of total chars — the is-"
    "capping-worth-it concentration summary; one keyed window carrying "
    "rank + cumulative sum + totals, exact integer threshold",
)
def q_pareto_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "n_chars", "doc_id"
    )
    return pareto_cut(docs, ["lang"], "n_chars", "doc_id", target_ppm=800_000)


from cosmos_xenna_spark.operators.cms import (  # noqa: E402
    cms_frequency_eval,
    cms_frequency_eval_sql,
)


@register(
    "q_countmin_eval",
    oracle=cms_frequency_eval_sql("SELECT text FROM documents", top_k=20),
    description="Count-Min sketch with an EXACT cross-engine contract "
    "(md5-bucket integer cells, 4x256, mergeable): corpus word "
    "frequencies sketched from the distinct-token table (ONE corpus "
    "shuffle), evaluated on the exact top-20 — estimate >= exact by "
    "construction, overestimate visible in the output; the approximate "
    "algorithm's engines agree bit-for-bit",
)
def q_countmin_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    return cms_frequency_eval(docs, top_k=20)


from cosmos_xenna_spark.operators.curation import (  # noqa: E402
    dsir_weights,
    dsir_weights_sql,
)

_DSIR_TARGET_SQL = "source IN ('src0', 'src1', 'src2', 'src3')"


@register(
    "q_dsir_weights",
    oracle=dsir_weights_sql(
        "SELECT doc_id, text, source FROM documents",
        _DSIR_TARGET_SQL,
        "doc_id",
        "text",
        1024,
    ),
    description="DSIR importance weights for data selection (hashed-"
    "bigram target-vs-raw floor-log2 ratio, exact BIGINT sum): the "
    "classifier-free 'make the crawl look like the target domain' "
    "resampling score; two corpus passes, 1024-row broadcast model, "
    "one partial-agg doc sum",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    return dsir_weights(
        docs,
        F.col("source").isin("src0", "src1", "src2", "src3"),
        "doc_id",
        "text",
        n_buckets=1024,
    )


from cosmos_xenna_spark.operators.curation import (  # noqa: E402
    source_temperature_mix,
    source_temperature_mix_sql,
)


@register(
    "q_source_temperature_mix",
    oracle=source_temperature_mix_sql(
        "SELECT doc_id, source FROM documents", "source", "doc_id", 10_000
    ),
    description="temperature-based mixture weighting at alpha=1/2 "
    "(the mT5/XLM low-resource flattening rule) with EXACT integer "
    "sqrt weights (corrected floor-sqrt, immune to libm boundary "
    "ulps): per-source ppm share, epoch quota, size-capped quota and "
    "deficit; one map-side-combined aggregation + single-row ledger",
)
def q_source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return source_temperature_mix(docs, "source", "doc_id", budget=10_000)


from cosmos_xenna_spark.operators.curation import (  # noqa: E402
    greedy_max_coverage,
    greedy_max_coverage_sql,
)


@register(
    "q_greedy_max_coverage",
    oracle=greedy_max_coverage_sql(
        "SELECT doc_id, text FROM documents", k=6
    ),
    description="greedy maximum-coverage data selection (facility-"
    "location lite, the (1-1/e)-approximate submodular subset step): "
    "pick 6 docs from a hash-sampled candidate pool, each maximizing "
    "uncovered-bigram count, deterministic id tie-break; per step the "
    "pick, its marginal gain and cumulative coverage. Oracle = the "
    "recursion unrolled into 6 CTE steps (the pagerank convention); "
    "Spark side = checkpointed pool token table + k bounded top-1 "
    "collects, broadcast anti-joins on the covered set",
)
def q_greedy_max_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return greedy_max_coverage(docs, k=6)
