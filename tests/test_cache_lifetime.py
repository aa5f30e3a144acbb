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


def _ids(spark) -> set[int]:
    """Ids of currently-pinned RDD blocks. Tracking ids (not a global
    count) keeps the tests immune to the JVM ContextCleaner
    asynchronously collecting blocks left over from OTHER tests."""
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def _released(spark, ids: set[int], rounds: int = 10) -> bool:
    """GC until none of ``ids`` is pinned anymore (finalizers may be
    pending)."""
    for _ in range(rounds):
        if not (_ids(spark) & ids):
            return True
        gc.collect()
    return not (_ids(spark) & ids)


DOCS = [
    Row(doc_id=i, source="s", text=" ".join(f"w{i}x{j}" for j in range(30)))
    for i in range(8)
]


def test_jaccard_verify_pairs_needs_no_cache(spark):
    """The array-intersect verify is shuffle-free on the corpus side and
    must not pin any cache blocks (the persist was the old exploded-word
    form's crutch)."""
    base = _ids(spark)
    docs = spark.createDataFrame(DOCS)
    pairs = spark.createDataFrame([Row(doc_a=0, doc_b=1), Row(doc_a=2, doc_b=3)])
    out = jaccard_verify_pairs(pairs, docs, threshold=0.0)
    assert out.count() == 2
    assert not (_ids(spark) - base), "no scratch cache expected"


def test_ngram_jaccard_pairs_releases_scratch_on_gc(spark):
    base = _ids(spark)
    docs = spark.createDataFrame(DOCS)
    out = ngram_jaccard_pairs(docs, scope_col="source", threshold=0.0)
    out.collect()
    new = _ids(spark) - base
    assert new
    out = None
    assert _released(spark, new)


def test_scratch_survives_while_handle_is_held(spark):
    """Two actions on the same handle both see the cache — the release
    must not fire early."""
    base = _ids(spark)
    docs = spark.createDataFrame(DOCS)
    out = ngram_jaccard_pairs(docs, scope_col="source", threshold=0.0)
    first = out.count()
    gc.collect()  # any wrongly-scoped finalizer would fire here
    second = out.count()
    assert first == second
    new = _ids(spark) - base
    assert new, "cache must survive a GC while the handle is held"
    out = None
    assert _released(spark, new)


def test_connected_components_releases_iteration_checkpoints(spark):
    base = _ids(spark)
    # A 16-chain plus a clique: multiple pointer-jumping rounds, so
    # several per-iteration checkpoints are created and must die.
    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(16)]
        + [Row(doc_a=100 + i, doc_b=100 + j) for i in range(4) for j in range(i + 1, 4)]
    )
    out = connected_components(pairs, max_iter=15)
    rows = {r.doc_id: r.cluster_id for r in out.collect()}
    assert rows[16] == 0 and rows[103] == 100
    # Only the FINAL label checkpoint may remain pinned — superseded
    # iteration state and the edge table must have been released
    # eagerly. The final one is deliberately left to the JVM's
    # ContextCleaner: derived frames may still plan against it.
    held = _ids(spark) - base
    assert len(held) <= 1, f"per-iteration checkpoints leaked: {len(held)} blocks"


def test_connected_components_derived_frames_survive_handle_gc(spark):
    """Frames DERIVED from the result must stay executable after the
    original handle is garbage-collected — the final checkpoint must
    NOT be released on a Python-lifetime signal (the composed
    fuzzy_dedup_keep pipeline hit exactly this)."""
    pairs = spark.createDataFrame([Row(doc_a=i, doc_b=i + 1) for i in range(8)])
    out = connected_components(pairs, max_iter=10)
    derived = out.filter("cluster_id = 0").select("doc_id")
    out = None
    gc.collect()  # would fire any (wrong) finalizer tied to `out`
    assert derived.count() == 9
