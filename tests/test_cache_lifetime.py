"""Operator-internal caches must not outlive their result handles.

Round-4 → round-5 bench forensics: the Jaccard operators persisted
their word sets and never released them, so every query that ran after
them in a long-lived session measured 3-5x slower (dead blocks evicting
live working sets). These tests pin the fix: once the caller drops the
result DataFrame, the executors' block manager returns to its prior
state.
"""

from __future__ import annotations

import gc

from pyspark.sql import Row

from cosmos_xenna_spark.operators.dedup import (
    connected_components,
    jaccard_verify_pairs,
    ngram_jaccard_pairs,
)


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _settle(spark) -> int:
    """GC until the persistent-RDD count stops dropping (finalizers
    from earlier tests may still be pending)."""
    prev = None
    n = _n_persistent(spark)
    while n != prev:
        gc.collect()
        prev, n = n, _n_persistent(spark)
    return n


DOCS = [
    Row(doc_id=i, source="s", text=" ".join(f"w{i}x{j}" for j in range(30)))
    for i in range(8)
]


def test_jaccard_verify_pairs_releases_scratch_on_gc(spark):
    base = _settle(spark)
    docs = spark.createDataFrame(DOCS)
    pairs = spark.createDataFrame([Row(doc_a=0, doc_b=1), Row(doc_a=2, doc_b=3)])
    out = jaccard_verify_pairs(pairs, docs, threshold=0.0)
    out.collect()
    assert _n_persistent(spark) > base, "word set should be cached while the handle lives"
    out = None
    assert _settle(spark) == base


def test_ngram_jaccard_pairs_releases_scratch_on_gc(spark):
    base = _settle(spark)
    docs = spark.createDataFrame(DOCS)
    out = ngram_jaccard_pairs(docs, scope_col="source", threshold=0.0)
    out.collect()
    assert _n_persistent(spark) > base
    out = None
    assert _settle(spark) == base


def test_scratch_survives_while_handle_is_held(spark):
    """Two actions on the same handle both see the cache — the release
    must not fire early."""
    base = _settle(spark)
    docs = spark.createDataFrame(DOCS)
    out = ngram_jaccard_pairs(docs, scope_col="source", threshold=0.0)
    first = out.count()
    second = out.count()
    assert first == second
    assert _n_persistent(spark) > base
    out = None
    assert _settle(spark) == base


def test_connected_components_releases_iteration_checkpoints(spark):
    base = _settle(spark)
    # A 16-chain plus a clique: multiple pointer-jumping rounds, so
    # several per-iteration checkpoints are created and must die.
    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(16)]
        + [Row(doc_a=100 + i, doc_b=100 + j) for i in range(4) for j in range(i + 1, 4)]
    )
    out = connected_components(pairs, max_iter=15)
    rows = {r.doc_id: r.cluster_id for r in out.collect()}
    assert rows[16] == 0 and rows[103] == 100
    # While the handle lives, only the final label checkpoint (and
    # nothing per-iteration) may remain pinned.
    held = _settle(spark)
    assert held - base <= 1, f"per-iteration checkpoints leaked: {held - base} blocks"
    out = None
    assert _settle(spark) == base


def test_connected_components_result_usable_after_release_cycle(spark):
    """The returned frame must stay executable after intermediate
    checkpoints were released (it plans only against the final one)."""
    pairs = spark.createDataFrame([Row(doc_a=i, doc_b=i + 1) for i in range(8)])
    out = connected_components(pairs, max_iter=10)
    gc.collect()  # fire any pending releases from the build
    assert out.count() == 9
    assert out.filter("cluster_id = 0").count() == 9
