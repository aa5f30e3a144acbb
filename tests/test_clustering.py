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
