#!/usr/bin/env python
"""Web-corpus curation end-to-end with the round-7 operator family:
canonicalize URLs, parse client IPs, key the corpus on the registered
domain, audit the near-dup blocking scheme, profile duplicate
clusters, and cut a LEAKAGE-SAFE train/val/test split where no
duplicate cluster straddles the eval boundary — the contamination
failure mode of row-hash splits.

The 100 TB shapes: URL/IP parsing is row-local JVM codegen (zero
shuffle); the blocking audit is a union-tag + one pair-key
aggregation (never candidates x truth); the split hash is row-local
after the cluster join.

Run:  python examples/web_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.dedup import (
    blocking_quality,
    connected_components,
    minhash_candidate_pairs,
)
from cosmos_xenna_spark.operators.sampling import group_aware_split
from cosmos_xenna_spark.operators.urls import with_normalized_urls, with_parsed_ips
from cosmos_xenna_spark.queries.text import _synth_url_spark
from cosmos_xenna_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="web_curation_pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. canonicalize the (synthetic) crawl metadata: URL + client IP
    meta = docs.select("doc_id", "text", _synth_url_spark().alias("url"))
    meta = with_normalized_urls(meta, "url")
    meta = meta.withColumn(
        "client_ip",
        F.format_string(
            "10.%d.%d.%d", F.col("doc_id") % 256, (F.col("doc_id") * 3) % 256, F.lit(7)
        ),
    )
    meta = with_parsed_ips(meta, "client_ip")
    n_domains = meta.select("registered_domain").distinct().count()
    n_private = meta.filter(F.col("is_private") == 1).count()
    print(f"canonicalized {n_docs} urls across {n_domains} domains; "
          f"{n_private} private-IP fetches flagged")

    # 2. near-dup blocking + audit against the shared-opening proxy truth
    cand = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    groups = (
        docs.select(
            "doc_id",
            F.array_join(F.slice(F.split("text", " "), 1, 8), " ").alias("k"),
        )
        .groupBy("k")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    truth = groups.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) ->"
                " transform(slice(ids, i + 2, size(ids)),"
                " y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    audit = blocking_quality(cand, truth, n_docs).collect()[0]
    print(
        f"blocking audit: {audit.n_candidates} candidates, "
        f"PC={audit.pair_completeness_ppm} ppm, RR={audit.reduction_ratio_ppm} ppm"
    )

    # 3. cluster, then split WITHOUT letting a cluster straddle splits
    cc = connected_components(cand.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")))
    base = docs.select("doc_id").join(cc, "doc_id", "left")
    split = group_aware_split(
        base, "doc_id", "cluster_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # leakage check: every cluster lands in exactly one split
    leaky = (
        split.filter(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    print(f"split sizes {counts}; clusters straddling splits: {leaky}")
    assert leaky == 0
    assert sum(counts.values()) == n_docs
    print("OK")
    spark.stop()


if __name__ == "__main__":
    main()
