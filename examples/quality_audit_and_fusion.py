#!/usr/bin/env python
"""Corpus QA and hybrid retrieval end-to-end with the round-6
continuation operators: referential-integrity audit, association /
trend statistics, LM-novelty quality gating, EXACT set-similarity
dedup, and reciprocal-rank-fused hybrid search.

The 100 TB shapes: the FK audit anti-joins distinct parent keys (never
the tables); chi-squared marginals are windows over the domain-bounded
cells frame; the LM reference model shuffle-joins on the bigram key
(never broadcast); the prefix-filter join verifies only pairs sharing
a rare-prefix token; RRF fuses bounded top-k lists.

Run:  python examples/quality_audit_and_fusion.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.dq import fk_integrity
from cosmos_xenna_spark.operators.quality import bigram_novelty
from cosmos_xenna_spark.operators.retrieval import bm25_topk, rrf_fuse
from cosmos_xenna_spark.operators.setsim import prefix_filter_jaccard_join
from cosmos_xenna_spark.operators.similarity import cosine_topk_bruteforce
from cosmos_xenna_spark.operators.stats import chi_squared, grouped_linreg
from cosmos_xenna_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quality_audit_and_fusion")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    # 1. Is the warehouse referentially sound before we trust joins?
    fk = fk_integrity(
        [("orders_customer", orders, "o_custkey", cust, "c_custkey")]
    ).collect()[0]
    print(f"FK orders->customer: {fk.n_orphans} orphans / {fk.n_child} rows")

    # 2. Is language independent of source? (chi-squared cells)
    chi = chi_squared(docs, "lang", "source")
    top = chi.orderBy(F.desc("contrib")).first()
    print(f"chi-squared: strongest cell ({top.a}, {top.b}) contrib={top.contrib:.3f}")

    # 3. Trend: does order value drift with order key per bucket?
    lr = grouped_linreg(
        orders.select(
            (F.col("o_custkey") % 5).alias("bucket"),
            F.col("o_orderkey").cast("double").alias("x"),
            F.col("o_totalprice").cast("double").alias("y"),
        ),
        ["bucket"],
        "x",
        "y",
    )
    print(f"linreg buckets: {lr.count()} fits")

    # 4. Quality gate: drop docs whose bigrams are mostly novel vs the
    #    trusted slice (unseen-or-rare > 60%).
    ref = docs.filter(F.col("source").isin("src0", "src1", "src2", "src3"))
    novelty = bigram_novelty(docs, ref, "doc_id", "text", 2)
    kept = docs.join(
        novelty.filter(F.col("novelty_ppm") <= 600_000).select("doc_id"), "doc_id"
    )
    print(f"novelty gate: {kept.count()} / {docs.count()} docs kept")

    # 5. EXACT near-dup pairs (guaranteed recall at Jaccard >= 0.7)
    #    on the gated corpus; drop the larger doc_id of each pair.
    pairs = prefix_filter_jaccard_join(kept, "doc_id", "text", 3, 7, 10)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    deduped = kept.join(drops, "doc_id", "left_anti")
    print(f"exact dedup: dropped {drops.count()} near-duplicate docs")

    # 6. Hybrid search over the surviving corpus: BM25 + cosine, fused.
    lex = bm25_topk(deduped, ["spark", "merge", "window"], k=20).withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("bigint"),
    )
    sem = (
        cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") == 0), k=20)
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    fused = rrf_fuse(
        {"lexical": lex.select("doc_id", "rank"), "semantic": sem},
        id_col="doc_id",
        topk=10,
    )
    rows = fused.collect()
    print(f"hybrid top-{len(rows)}: best doc_id={rows[0].doc_id}")

    spark.stop()


if __name__ == "__main__":
    main()
