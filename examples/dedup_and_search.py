#!/usr/bin/env python
"""LLM training-data curation in one script: fuzzy dedup, quality
filtering, and embedding similarity search over the documents table.

Each step is one of the engine's first-class operators (COVERAGE.md
§2.B rows); the composition here is the 100 TB curation shape — every
join is bucket-/cluster-local, nothing touches the driver except tiny
summaries.

Run:  python examples/dedup_and_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.clustering import kmeans_fit_assign
from cosmos_xenna_spark.operators.dedup import (
    containment_verify_pairs,
    exact_dedup,
    minhash_candidate_pairs,
)
from cosmos_xenna_spark.operators.packing import pack_sequences
from cosmos_xenna_spark.operators.similarity import ivf_topk
from cosmos_xenna_spark.operators.pq import ivf_pq_topk
from cosmos_xenna_spark.operators.text import n_tokens_col, normalize_text
from cosmos_xenna_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="dedup_and_search_example")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup on NORMALIZED content (case/punctuation-robust;
    #    keep lowest doc_id per canonical text)
    docs = exact_dedup(
        normalize_text(docs), key_cols=["norm_text"], order_col="doc_id"
    ).drop("norm_text")
    n1 = docs.count()

    # 2. fuzzy dedup: LSH candidates, verified by word-set containment
    #    (catches subset/quote-expansion dups symmetric Jaccard misses),
    #    drop the higher id of every verified pair
    pairs = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    verified = containment_verify_pairs(pairs, docs, threshold=0.8)
    dupes = verified.select(F.col("doc_b").alias("doc_id")).distinct()
    docs = docs.join(dupes, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. quality gate: drop too-short docs
    docs = (
        docs.withColumn("n_words", n_tokens_col())
        .filter(F.col("n_words") >= 20)
        .select("doc_id", "text")
    )
    n3 = docs.count()

    # 4. similarity search over embeddings of the survivors
    emb = load_table(spark, sf_dir, "embeddings").join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    clustered, _ = kmeans_fit_assign(emb, k=8)
    queries = clustered.filter(F.col("vec_id") < 5)
    nn = ivf_topk(clustered, queries, k=3, n_probe=2, cluster_col="cluster")

    # 4b. the same search through the compressed IVF+PQ read path
    #     (8-byte codes + ADC + exact re-rank — the billion-vector plan)
    qvecs = [(r.vec_id, [float(x) for x in r.embedding]) for r in queries.collect()]
    nn_pq = ivf_pq_topk(emb, qvecs, k_top=3, n_clusters=8, n_probe=2, m=8, k_codes=16)
    n_pq = nn_pq.count()

    # 5. pack the curated corpus into fixed-length training sequences
    # (concat-and-chunk; exact distributed prefix sum, no global window)
    packed = pack_sequences(docs, seq_len=256)
    n_seqs = packed.agg(F.max("seq_id")).collect()[0][0] + 1

    print(f"documents: {n0} -> exact {n1} -> fuzzy {n2} -> quality {n3}")
    print(f"packed into {n_seqs} training sequences of 256 tokens")
    print(f"IVF+PQ returned {n_pq} re-ranked neighbors for {len(qvecs)} queries")
    print("sample neighbors:")
    for r in nn.orderBy("query_id", "rank").limit(9).collect():
        print(f"  q{r.query_id} #{r.rank}: vec {r.neighbor_id} (sim {r.sim:.4f})")
    spark.stop()


if __name__ == "__main__":
    main()
