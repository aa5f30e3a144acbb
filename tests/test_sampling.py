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


def test_mixture_rebalance_uniform(spark, sf_dir):
    from cosmos_xenna_spark.catalog import load_table
    from cosmos_xenna_spark.operators.sampling import mixture_rebalance

    docs = load_table(spark, sf_dir, "documents")
    pre = {r["source"]: r["n"] for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    out = mixture_rebalance(docs, strata_col="source", key_col="doc_id")
    post = {r["source"]: r["n"] for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    floor = min(pre.values())
    # The smallest stratum is kept whole (rate exactly 1.0)...
    smallest = min(pre, key=pre.get)
    assert post[smallest] == pre[smallest]
    # ...and every stratum lands near the uniform target (hash-Bernoulli
    # rates are approximate per stratum).
    for s, n in post.items():
        assert n <= pre[s]
        assert abs(n - floor) <= max(5, int(0.35 * floor)), (s, n, floor)


def test_mixture_rebalance_explicit_weights_and_total(spark, sf_dir):
    from cosmos_xenna_spark.catalog import load_table
    from cosmos_xenna_spark.operators.sampling import mixture_rebalance

    docs = load_table(spark, sf_dir, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    weights = {langs[0]: 1.0}  # keep only one stratum
    out = mixture_rebalance(docs, "lang", "doc_id", weights=weights)
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got == {langs[0]}
    # weights naming no stratum present in the data is an error
    import pytest

    with pytest.raises(ValueError):
        mixture_rebalance(docs, "lang", "doc_id", weights={"zz": 1.0})


def test_semantic_dedup_keep_lowest_id_survives(spark):
    from pyspark.sql import Row

    from cosmos_xenna_spark.operators.similarity import semantic_dedup_keep

    rows = [
        # block 0: vectors 0 and 1 identical (cos=1) -> 1 dropped;
        # vector 2 orthogonal -> kept
        Row(vec_id=0, embedding=[1.0, 0.0], label=0),
        Row(vec_id=1, embedding=[2.0, 0.0], label=0),
        Row(vec_id=2, embedding=[0.0, 1.0], label=0),
        # block 1: same direction as vec 0 but different block -> kept
        Row(vec_id=3, embedding=[1.0, 0.0], label=1),
    ]
    emb = spark.createDataFrame(rows)
    kept = {r.vec_id for r in semantic_dedup_keep(emb, threshold=0.95).collect()}
    assert kept == {0, 2, 3}


def test_fixed_size_per_group_exact_and_invariant(spark, sf_dir):
    from cosmos_xenna_spark.catalog import load_table
    from cosmos_xenna_spark.operators.sampling import fixed_size_per_group

    docs = load_table(spark, sf_dir, "documents")
    out = fixed_size_per_group(docs, 20, ["lang"], "doc_id")
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    want = {r.lang: min(20, r.n) for r in docs.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert sizes == want
    a = {(r.doc_id, r.lang) for r in out.collect()}
    b = {(r.doc_id, r.lang) for r in fixed_size_per_group(
        docs.repartition(13, "source"), 20, ["lang"], "doc_id").collect()}
    assert a == b


def test_group_aware_split_no_leakage(spark):
    import random

    from cosmos_xenna_spark.operators.sampling import group_aware_split

    rng = random.Random(91)
    # 60 clustered rows across 12 clusters + 40 singletons (NULL group)
    rows = [(i, f"c{rng.randrange(12)}") for i in range(60)]
    rows += [(100 + i, None) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = group_aware_split(df, "id", "grp", {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {(r.id): (r.grp, r.split) for r in out.collect()}
    # every member of a cluster shares the split
    by_g: dict[str, set] = {}
    for _id, (g, s) in got.items():
        if g is not None:
            by_g.setdefault(g, set()).add(s)
    assert by_g and all(len(s) == 1 for s in by_g.values())
    # total assignment, deterministic under repartitioning
    out2 = group_aware_split(
        df.repartition(7, "id"), "id", "grp", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert got == {(r.id): (r.grp, r.split) for r in out2.collect()}
    assert {s for _, s in got.values()} == {"train", "val", "test"}


def test_weighted_sample_fixed_properties(spark):
    from pyspark.sql import functions as F

    from cosmos_xenna_spark.operators.sampling import weighted_sample_fixed

    rows = [(g, i, float(wt)) for g in ("a", "b") for i, wt in enumerate([1, 1, 2, 4, 8])]
    rows.append(("a", 99, 0.0))   # zero weight: never sampled
    rows.append(("a", 98, None))  # NULL weight: never sampled
    df = spark.createDataFrame(rows, "g string, id long, w double")

    out = weighted_sample_fixed(df, ["g"], "w", k=2, id_cols=["g", "id"])
    got = sorted((r.g, r.id) for r in out.collect())
    assert len([1 for g, _ in got if g == "a"]) == 2
    assert len([1 for g, _ in got if g == "b"]) == 2
    assert all(i not in (98, 99) for _, i in got)
    # deterministic under repartitioning
    out2 = weighted_sample_fixed(df.repartition(7, "id"), ["g"], "w", k=2, id_cols=["g", "id"])
    assert got == sorted((r.g, r.id) for r in out2.collect())

    # law check: over many independent salts, P(id wins a k=1 draw)
    # tracks w / sum(w) (Efraimidis-Spirakis first-arrival property)
    base = spark.createDataFrame(
        [("g", i, float(wt)) for i, wt in enumerate([1, 2, 4, 8])], "g string, id long, w double"
    ).cache()
    n_draws = 150
    wins = {i: 0 for i in range(4)}
    for s in range(n_draws):
        r = weighted_sample_fixed(base, ["g"], "w", k=1, id_cols=["g", "id"], salt=f"s{s}:").collect()
        wins[r[0].id] += 1
    total_w = 15.0
    for i, wt in enumerate([1, 2, 4, 8]):
        exp = n_draws * wt / total_w
        # 4 sigma of a binomial around the expectation
        sd = (n_draws * (wt / total_w) * (1 - wt / total_w)) ** 0.5
        assert abs(wins[i] - exp) <= 4 * sd + 1, (i, wins[i], exp)
