#!/usr/bin/env python
"""Corpus QA, governance, and output layout in one script: declarative
data-quality gating, privacy audit, distribution profiling, Bloom-pruned
decontamination, mixture rebalancing, and webdataset-style shard
assignment — the steps that surround dedup in a production curation
pipeline (see examples/dedup_and_search.py for the dedup/search half).

Every step is a first-class engine operator (COVERAGE.md rows).  The
100 TB shapes: the DQ suite is one aggregation pass however many rules
it holds; the Bloom filter broadcasts bits, not keys, and rows the
filter clears never touch a join; shard ids come from an exact
distributed prefix sum, never a global window.

Run:  python examples/curate_and_shard.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.bloom import bloom_anti_join
from cosmos_xenna_spark.operators.curation import (
    domain_cap,
    heavy_hitters,
    percentile_gate,
)
from cosmos_xenna_spark.operators.dq import (
    Expectation,
    evaluate_expectations,
    k_anonymity_violations,
)
from cosmos_xenna_spark.operators.sampling import mixture_rebalance
from cosmos_xenna_spark.operators.sharding import shard_summary
from cosmos_xenna_spark.operators.stats import histogram
from cosmos_xenna_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curate_and_shard_example")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. data-quality gate: one aggregation pass over the whole suite
    suite = [
        Expectation("id_present", "doc_id", "not_null"),
        Expectation("id_unique", "doc_id", "unique"),
        Expectation("text_present", "text", "not_null"),
        Expectation("lang_domain", "lang", "in_set", values=("en", "de", "fr", "es")),
        Expectation("chars_sane", "n_chars", "in_range", lo=1, hi=100_000),
    ]
    report = evaluate_expectations(docs, suite)
    print("DQ report:")
    for r in report.collect():
        print(f"  {r['rule']:<14} violations={r['violations']:<6} passed={r['passed']}")

    # 2. privacy audit: quasi-identifier combinations below k=5
    rare = k_anonymity_violations(
        docs.withColumn("size_band", F.expr("n_chars div 50")),
        ["lang", "source", "size_band"],
        k=5,
    )
    print(f"k-anonymity: {rare.count()} quasi-identifier groups below k")

    # 3. distribution profile: document length histogram
    hist = histogram(docs, "n_chars", lo=0.0, hi=400.0, nbins=8)
    print("length histogram:", {r["bucket"]: r["n"] for r in hist.collect()})

    # 4. decontamination: drop docs whose exact text appears in the
    #    (here: simulated) eval set — Bloom bitset broadcast, the
    #    definite-no rows never join
    eval_set = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    clean = bloom_anti_join(docs, eval_set, "text")
    n1 = clean.count()

    # 5. mixture shaping: cap any one domain's share (skew-safe
    #    two-stage window), drop the bottom quality quartile per
    #    language (broadcast threshold, facts never shuffle), then
    #    rebalance the language mixture toward uniform
    capped = domain_cap(clean, "source", "doc_id", cap=20)
    gated = percentile_gate(capped, ["lang"], "n_chars", pct=0.25)
    balanced = mixture_rebalance(gated, strata_col="lang", key_col="doc_id")
    n2 = balanced.count()

    # 5b. vocabulary heavy hitters — stopword/boilerplate discovery
    hh = heavy_hitters(balanced, "text", min_ppm=20_000)
    print(f"heavy hitters (>=2% of tokens): {hh.count()} words")

    # 6. assign output shards by cumulative characters (~8 KiB each)
    shards = shard_summary(balanced, "n_chars", ["doc_id"], shard_size=8192)
    n_shards = shards.count()
    sizes = shards.agg(
        F.min("total_size").alias("lo"), F.max("total_size").alias("hi")
    ).collect()[0]

    print(
        f"docs {n0} -> decontaminated {n1} -> rebalanced {n2}; "
        f"{n_shards} shards, sizes [{sizes['lo']}, {sizes['hi']}]"
    )
    spark.stop()


if __name__ == "__main__":
    main()
