"""Sampling-operator queries with DuckDB oracles.

Every sample decision is a portable md5-derived hash of the key, so the
oracle reproduces the exact row set — the whole point of deterministic
sampling (``operators/sampling.py`` docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.functions import md5_long63_sql
from cosmos_xenna_spark.operators.sampling import (
    fixed_size_per_group,
    deterministic_sample,
    fixed_size_sample,
    mixture_rebalance,
    sample_anti_join,
    split_weighted,
    stratified_sample,
)
from cosmos_xenna_spark.queries import register

_H_DOC = md5_long63_sql("CAST(doc_id AS VARCHAR)", "sample:")
_H_STRATA = md5_long63_sql("CAST(doc_id AS VARCHAR)", "strata:")
_H_FIXED = md5_long63_sql("CAST(doc_id AS VARCHAR)", "fixed:")
_H_SPLIT = md5_long63_sql("CAST(doc_id AS VARCHAR)", "split:")
_H_MIX = md5_long63_sql("CAST(doc_id AS VARCHAR)", "mix:")


@register(
    "q_sample_deterministic",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE {_H_DOC} % 1000000 < 200000
    """,
    description="deterministic ~20% Bernoulli sample by portable key hash "
    "— identical rows across runs/partitionings/engines, zero shuffles",
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, 0.2, "doc_id").select("doc_id", "lang", "n_chars")


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT lang, COUNT(*) AS n FROM documents
    WHERE {_H_STRATA} % 1000000 <
          CASE lang WHEN 'en' THEN 100000 WHEN 'de' THEN 500000
                    WHEN 'fr' THEN 900000 END
      AND lang IN ('en', 'de', 'fr')
    GROUP BY lang
    """,
    description="stratified sample with per-language rates (10%/50%/90%) "
    "— reproducible sampleBy; unlisted strata dropped",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, {"en": 0.1, "de": 0.5, "fr": 0.9}, strata_col="lang", key_col="doc_id"
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_sample_fixed_size",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    ORDER BY {_H_FIXED} ASC, doc_id ASC
    LIMIT 50
    """,
    description="fixed-size deterministic sample: the 50 smallest key "
    "hashes (distributed top-k, the reservoir-sampling replacement)",
)
def q_sample_fixed_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fixed_size_sample(docs, 50, "doc_id").select("doc_id", "lang")


@register(
    "q_sample_split_weighted",
    oracle=f"""
    SELECT split, COUNT(*) AS n FROM (
      SELECT CASE WHEN {_H_SPLIT} % 1000000 < 50000 THEN 'calib'
                  WHEN {_H_SPLIT} % 1000000 < 200000 THEN 'eval'
                  ELSE 'train' END AS split
      FROM documents
    ) GROUP BY split
    """,
    description="weighted named splits (5% calib / 15% eval / 80% train) "
    "by deterministic hash — arbitrary-weight generalization of "
    "train/val/test splitting",
)
def q_sample_split_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = split_weighted(docs, {"calib": 0.05, "eval": 0.15, "train": 0.8}, "doc_id")
    return out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_sample_holdout",
    oracle=f"""
    SELECT COUNT(*) AS n_holdout, CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM documents
    WHERE doc_id NOT IN (
      SELECT doc_id FROM documents WHERE {_H_DOC} % 1000000 < 200000
    )
    """,
    description="held-out complement of a deterministic sample via "
    "anti-join on the sampling key",
)
def q_sample_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sampled = deterministic_sample(docs, 0.2, "doc_id")
    held = sample_anti_join(docs, sampled, "doc_id")
    return held.agg(
        F.count(F.lit(1)).alias("n_holdout"),
        F.min("doc_id").cast("bigint").alias("min_id"),
    )


@register(
    "q_mixture_rebalance",
    # The oracle mirrors the operator's driver-side rate arithmetic
    # step for step in DOUBLE (bare decimals are DECIMAL in DuckDB, so
    # every constant is cast): uniform target share w = 1/n_strata,
    # total = min(n_s / w) (largest total with no upsampling), stratum
    # keep-rate = min(1, total*w/n_s), cutoff = trunc(rate * 1e6) —
    # int() in Python truncates, CAST in DuckDB rounds, hence FLOOR.
    oracle=f"""
    WITH counts AS (
      SELECT CAST(source AS VARCHAR) AS s, COUNT(*) AS n
      FROM documents GROUP BY source
    ),
    k AS (SELECT CAST(1.0 AS DOUBLE) / COUNT(*) AS w FROM counts),
    tot AS (SELECT MIN(CAST(n AS DOUBLE) / w) AS total FROM counts, k),
    cuts AS (
      SELECT s,
             CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
                              (total * w) / CAST(n AS DOUBLE)) * 1000000)
                  AS BIGINT) AS cut
      FROM counts, k, tot
    )
    SELECT d.source, COUNT(*) AS n_kept
    FROM documents d JOIN cuts c ON c.s = d.source
    WHERE {_H_MIX} % 1000000 < c.cut
    GROUP BY d.source
    """,
    description="mixture rebalance (data mixing): deterministically "
    "downsample every source toward a uniform target mixture — counts "
    "job -> driver-literal per-stratum rates -> portable-hash filter",
)
def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = mixture_rebalance(docs, strata_col="source", key_col="doc_id")
    return out.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


_H_FIXEDG = md5_long63_sql("CAST(doc_id AS VARCHAR)", "fixedg:")


@register(
    "q_sample_fixed_per_group",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {_H_FIXEDG} ASC, doc_id ASC) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
    description="stratified fixed-size sample: exactly min(20, group size) "
    "docs per language by the n smallest salted key hashes within each "
    "group — one keyed window, deterministic under any partitioning",
)
def q_sample_fixed_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fixed_size_per_group(docs, 20, ["lang"], "doc_id").select("doc_id", "lang")


from cosmos_xenna_spark.operators.sampling import (  # noqa: E402
    group_aware_split,
    group_aware_split_sql,
)


@register(
    "q_split_leakage_safe",
    oracle=group_aware_split_sql(
        """
        SELECT d.doc_id, cc.cluster_id
        FROM documents d LEFT JOIN (
          WITH RECURSIVE pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ({buckets}) a JOIN ({buckets}) b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
          ),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
          ),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst
          )
          SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
        ) cc ON d.doc_id = cc.doc_id
        """.format(buckets=__import__("cosmos_xenna_spark.queries.dedup", fromlist=["_BUCKETS_SQL"])._BUCKETS_SQL),
        "doc_id",
        "cluster_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ),
    description="leakage-safe train/val/test split: every near-duplicate "
    "CLUSTER (LSH candidate graph connected component) lands wholly in one "
    "split — the contamination guard row-hash splits lack; singletons fall "
    "back to their own id; deterministic md5 split hash, row-local after "
    "the CC join",
)
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import (
        connected_components,
        minhash_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    cc = connected_components(pairs)
    base = docs.select("doc_id").join(cc, "doc_id", "left")
    return group_aware_split(
        base, "doc_id", "cluster_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )


from cosmos_xenna_spark.operators.sampling import weighted_sample_fixed  # noqa: E402


@register(
    "q_sample_weighted_fixed",
    oracle=None,
    description="weighted sampling WITHOUT replacement, exactly k per group "
    "(Efraimidis-Spirakis exponential arrivals from deterministic md5 "
    "uniforms — P(first) = w/sum(w), salt-redrawable, partitioning-"
    "invariant): row-local priority + one keyed top-k window; rows-only by "
    "design (float ln has no cross-engine oracle) — the sampling law is "
    "pinned by the 150-draw frequency property test",
)
def q_sample_weighted_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("w")
    )
    return weighted_sample_fixed(docs, ["lang"], "w", k=20, id_cols=["doc_id"])


from cosmos_xenna_spark.operators.sampling import (  # noqa: E402
    kfold_assign,
    kfold_assign_sql,
)


@register(
    "q_kfold_assign",
    oracle=kfold_assign_sql(
        "SELECT lang, doc_id FROM documents", ["lang"], "doc_id", k=5
    ),
    description="stratified k-fold assignment with EXACT balance (fold = "
    "(rank-1) % k per stratum; fold sizes differ by at most 1 — the "
    "guarantee hash splitting gives only in expectation); per-(stratum, "
    "fold) audit summary, one keyed window",
)
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    return kfold_assign(docs, ["lang"], "doc_id", k=5)
