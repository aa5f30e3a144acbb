"""Sampling operator properties: the whole point is partitioning
invariance, which `df.sample()` does NOT have."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.sampling import (
    deterministic_sample,
    fixed_size_sample,
    sample_anti_join,
    split_weighted,
    stratified_sample,
)


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_sample_invariant_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _ids(deterministic_sample(docs, 0.3, "doc_id"))
    b = _ids(deterministic_sample(docs.repartition(13), 0.3, "doc_id"))
    c = _ids(deterministic_sample(docs.coalesce(1), 0.3, "doc_id"))
    assert a == b == c
    assert 0 < len(a) < docs.count()


def test_sample_rate_approximate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    kept = deterministic_sample(docs, 0.5, "doc_id").count()
    assert abs(kept / n - 0.5) < 0.1


def test_stratified_drops_unlisted_and_rates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, {"en": 1.0, "de": 0.0}, "lang", "doc_id")
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}  # de rate 0, others unlisted -> dropped
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # rate 1.0 keeps every row


def test_fixed_size_exact_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = _ids(fixed_size_sample(docs, 25, "doc_id"))
    b = _ids(fixed_size_sample(docs.repartition(7), 25, "doc_id"))
    assert len(a) == 25 and a == b


def test_split_weighted_partitions_everything(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = split_weighted(docs, {"a": 0.25, "b": 0.25, "c": 0.5}, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"a", "b", "c"}


def test_holdout_is_exact_complement(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sampled = deterministic_sample(docs, 0.4, "doc_id")
    held = sample_anti_join(docs, sampled, "doc_id")
    assert sampled.count() + held.count() == docs.count()
    overlap = sampled.select("doc_id").intersect(held.select("doc_id")).count()
    assert overlap == 0


def test_invalid_rates_raise(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5, "doc_id")
    with pytest.raises(ValueError):
        split_weighted(docs, {"a": 0.5, "b": 0.2}, "doc_id")
