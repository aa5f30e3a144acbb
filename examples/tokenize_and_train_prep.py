#!/usr/bin/env python
"""Tokenizer induction and training-batch prep end-to-end: learn a BPE
vocabulary from the corpus, audit its coverage, encode every document,
then pack the token sequences into fixed-length training rows and
assign output shards — the last mile between a curated corpus and a
training job.

The 100 TB shapes: BPE statistics run on the word-frequency table
(corpus touched once, merge loop vocab-bounded); vocabulary coverage
broadcasts the vocab back (corpus shuffles once); sequence packing
uses an exact distributed prefix sum, never a global window.

Run:  python examples/tokenize_and_train_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.bpe import bpe_encode, bpe_train
from cosmos_xenna_spark.operators.packing import pack_sequences
from cosmos_xenna_spark.operators.sharding import shard_summary
from cosmos_xenna_spark.operators.text import vocab_coverage
from cosmos_xenna_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="tokenize_and_train_prep")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. word-level vocabulary audit BEFORE committing to a budget:
    #    what OOV rate would a 30-word vocab leave?
    cov = vocab_coverage(docs, "text", vocab_size=30)
    oov = cov.agg(F.avg("oov_rate").alias("r")).collect()[0]["r"]
    print(f"top-30 word vocab leaves mean OOV rate {oov:.3f}")

    # 2. learn subword merges (corpus scanned once; the merge loop runs
    #    on the distinct-word table)
    merges = bpe_train(docs, n_merges=12, min_pair_count=2)
    print(f"learned {len(merges)} merges; first 5: {merges[:5]}")

    # 3. encode every document with the learned ranks (Arrow kernel)
    encoded = bpe_encode(docs, merges)
    stats = encoded.agg(
        F.sum("n_tokens").alias("tokens"),
        F.avg(F.col("n_tokens") / F.col("n_words")).alias("tokens_per_word"),
    ).collect()[0]
    print(
        f"encoded {n0} docs -> {stats['tokens']} subword tokens "
        f"({stats['tokens_per_word']:.2f} per word)"
    )

    # 4. pack token sequences into fixed-length training rows (exact
    #    distributed prefix sum — no global window) and lay out shards
    packed = pack_sequences(
        encoded.select("doc_id", F.col("tokens").alias("text")),
        seq_len=512,
    )
    n_seqs = packed.select("seq_id").distinct().count()
    shards = shard_summary(
        encoded, "n_tokens", ["doc_id"], shard_size=16_384
    )
    print(f"packed into {n_seqs} training sequences, {shards.count()} shards")
    spark.stop()


if __name__ == "__main__":
    main()
