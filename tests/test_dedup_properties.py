"""Property tests for the fuzzy-dedup operators (SURVEY.md §5 port plan:
LSH ops get property assertions — recall on planted near-duplicates —
rather than hash equality)."""

from __future__ import annotations

import random


from cosmos_xenna_spark.operators.dedup import (
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)

VOCAB = [f"w{i:03d}" for i in range(400)]


def _mk_docs(spark, n_base=60, words_per_doc=60, seed=7):
    """Base docs + a near-duplicate of each (a few word substitutions)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_base):
        words = [rng.choice(VOCAB) for _ in range(words_per_doc)]
        rows.append((i, " ".join(words), "src"))
        near = list(words)
        for _ in range(3):  # ~5% substitution -> shingle jaccard ~0.85
            near[rng.randrange(words_per_doc)] = rng.choice(VOCAB)
        rows.append((1000 + i, " ".join(near), "src"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_minhash_lsh_recall(spark):
    docs = _mk_docs(spark)
    pairs = minhash_candidate_pairs(docs, n_hashes=16, band_size=4).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    planted = {(i, 1000 + i) for i in range(60)}
    recall = len(found & planted) / len(planted)
    # 4 bands x 4 rows: P(candidate) = 1-(1-s^4)^4 ~ 0.92 at s=0.8
    assert recall >= 0.7, f"LSH recall too low: {recall} ({len(found)} pairs found)"


def test_minhash_lsh_precision_on_random_docs(spark):
    """Unrelated random docs (jaccard ~ 0) should almost never collide."""
    rng = random.Random(11)
    rows = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(60)), "src") for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pairs = minhash_candidate_pairs(docs, n_hashes=16, band_size=4).count()
    assert pairs <= 2, f"too many false-positive candidates: {pairs}"


def test_jaccard_pairs_match_planted(spark):
    docs = _mk_docs(spark)
    pairs = ngram_jaccard_pairs(docs, scope_col="source", threshold=0.7).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    planted = {(i, 1000 + i) for i in range(60)}
    assert len(found & planted) >= 55
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_inter <= r.n_union


def test_simhash_near_duplicates_have_small_hamming(spark):
    docs = _mk_docs(spark, n_base=30)
    fp = {r.doc_id: r.simhash for r in simhash(docs).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    near = [hamming(fp[i], fp[1000 + i]) for i in range(30)]
    rng = random.Random(3)
    far = [
        hamming(fp[i], fp[1000 + j])
        for i, j in ((rng.randrange(30), rng.randrange(30)) for _ in range(30))
        if i != j
    ]
    assert sum(near) / len(near) < sum(far) / len(far) - 5, (
        f"simhash does not separate near-dups: near={sum(near)/len(near)}, "
        f"far={sum(far)/len(far)}"
    )


def test_connected_components_chain_and_clique(spark):
    from cosmos_xenna_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, exercises pointer jumping), clique
    # 10-11-12, isolated pair (20, 21); nodes not in any pair are absent.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, max_iter=10).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_long_chain_converges(spark):
    from cosmos_xenna_spark.operators.dedup import connected_components

    # 40-node path: min-propagation alone needs ~40 rounds; pointer
    # jumping must converge within the 25-iteration default cap.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    rows = connected_components(pairs).collect()
    assert len(rows) == 41
    assert {r.cluster_id for r in rows} == {0}


def test_connected_components_reliable_checkpoint_identical(spark, tmp_path):
    """reliable_checkpoint=True (durable checkpoint dir — survives
    executor loss on long 100 TB runs) must produce the same clusters
    as the local-checkpoint default."""
    from cosmos_xenna_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    reliable = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs, reliable_checkpoint=True).collect()
    }
    local = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    assert reliable == local
    assert reliable == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
