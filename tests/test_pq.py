"""Product-quantization property tests: ADC table-lookup exactness,
partitioning invariance, and planted-cluster recall vs exact L2."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cosmos_xenna_spark.operators.pq import pq_encode, pq_fit, pq_topk, pq_topk_rerank


def _planted(spark, n=400, dim=32, n_clusters=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 10.0
    vecs = [
        (i, (centers[i % n_clusters] + rng.normal(size=dim)).tolist())
        for i in range(n)
    ]
    return (
        spark.createDataFrame(vecs, "vec_id long, embedding array<double>"),
        {i: v for i, v in vecs},
    )


def test_pq_encode_shapes_and_invariance(spark):
    emb, _ = _planted(spark)
    books = pq_fit(emb, m=4, k=8)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    codes1 = {r.vec_id: list(r.codes) for r in pq_encode(emb, books).collect()}
    codes2 = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb.repartition(7), books).collect()
    }
    assert codes1 == codes2
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in codes1.values())


def test_pq_adc_matches_numpy_tables(spark):
    """approx_d2 must equal the numpy-computed sum of subspace
    distances between the query and the row's assigned centroids."""
    emb, raw = _planted(spark, n=100, dim=16)
    books = pq_fit(emb, m=4, k=8)
    enc = {r.vec_id: list(r.codes) for r in pq_encode(emb, books).collect()}
    qid, qv = 3, raw[3]
    got = {
        r.vec_id: r.approx_d2
        for r in pq_topk(pq_encode(emb, books), books, [(qid, qv)], k_top=100).collect()
    }
    q = np.asarray(qv)
    d_sub = 4
    for vid, codes in enc.items():
        want = sum(
            ((np.asarray(books[s][codes[s]]) - q[s * d_sub : (s + 1) * d_sub]) ** 2).sum()
            for s in range(4)
        )
        assert abs(got[vid] - want) < 1e-9


def test_pq_recall_on_planted_clusters(spark):
    """The ADC-shortlist + exact-re-rank pipeline must recover >= 0.9
    of the exact L2 top-5 on planted clusters (raw PQ ranking alone
    measures ~0.4 here — quantization error is the same scale as the
    within-cluster neighbor gaps, which is exactly why production PQ
    always re-ranks; see pq_topk_rerank's docstring)."""
    emb, raw = _planted(spark, n=400, dim=32)
    books = pq_fit(emb, m=8, k=16)
    enc = pq_encode(emb, books)
    queries = [(i, raw[i]) for i in range(20)]
    approx = {
        (r.query_id, r.vec_id)
        for r in pq_topk_rerank(enc, emb, books, queries, k_top=5, shortlist=50).collect()
    }
    hits = total = 0
    mat = np.stack([np.asarray(raw[i]) for i in range(400)])
    for qid, qv in queries:
        d2 = ((mat - np.asarray(qv)) ** 2).sum(axis=1)
        exact = set(np.argsort(d2, kind="stable")[:5].tolist())
        hits += sum(1 for v in exact if (qid, v) in approx)
        total += 5
    assert hits / total >= 0.9, f"recall {hits / total}"


def test_pq_sampled_fit_still_recalls(spark):
    """Codebooks fit on the 1/4 hash-sample (the 100 TB pattern) must
    still give usable recall on the full set."""
    emb, raw = _planted(spark, n=400, dim=32)
    books = pq_fit(emb, m=8, k=16, sample_denom=4)
    enc = pq_encode(emb, books)
    queries = [(i, raw[i]) for i in range(10)]
    approx = {
        (r.query_id, r.vec_id)
        for r in pq_topk_rerank(enc, emb, books, queries, k_top=5, shortlist=50).collect()
    }
    mat = np.stack([np.asarray(raw[i]) for i in range(400)])
    hits = total = 0
    for qid, qv in queries:
        d2 = ((mat - np.asarray(qv)) ** 2).sum(axis=1)
        exact = set(np.argsort(d2, kind="stable")[:5].tolist())
        hits += sum(1 for v in exact if (qid, v) in approx)
        total += 5
    assert hits / total >= 0.9, f"recall {hits / total}"


def test_ivf_pq_recall_on_planted_clusters(spark):
    """The composed IVF x PQ x re-rank pipeline must recover >= 0.9 of
    the exact top-5 with n_probe=2 over 8 planted clusters — each
    query's true neighbors live in its own cell, so correct coarse
    probing + ADC shortlist + exact re-rank finds them while scanning
    ~2/8 of the codes."""
    from cosmos_xenna_spark.operators.pq import ivf_pq_topk

    emb, raw = _planted(spark, n=400, dim=32)
    queries = [(i, raw[i]) for i in range(15)]
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_pq_topk(
            emb, queries, k_top=5, n_clusters=8, n_probe=2, m=8, k_codes=16
        ).collect()
    }
    mat = np.stack([np.asarray(raw[i]) for i in range(400)])
    hits = total = 0
    for qid, qv in queries:
        d2 = ((mat - np.asarray(qv)) ** 2).sum(axis=1)
        exact = set(np.argsort(d2, kind="stable")[:5].tolist())
        hits += sum(1 for v in exact if (qid, v) in approx)
        total += 5
    assert hits / total >= 0.9, f"recall {hits / total}"
