#!/usr/bin/env python
"""Graph analytics end-to-end with the round-8 operator family: build
the directed high-volume trade-flow graph (scale-relative threshold),
collapse trade loops with k-bounded SCC, price the cheapest supply
path from a seed nation (weighted SSSP), fingerprint the topology
(degree assortativity) on the document near-dup graph, cluster it
(label propagation) and grade the clustering (exact-ppm modularity),
then propose missing dedup edges by resource-allocation link
prediction.

The 100 TB shapes: closures are frontier joins against a checkpointed
edge list (one row per reached node / (node, reach) pair); the wedge
join is hub-capped (sum(deg^2) bounded); every score is integer-exact
so results are partitioning-invariant.

Run:  python examples/graph_analytics_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosmos_xenna_spark.operators.dedup import minhash_candidate_pairs
from cosmos_xenna_spark.operators.graph import (
    degree_assortativity,
    label_propagation,
    modularity,
    resource_allocation_link_prediction,
    scc_labels,
    sssp_weighted,
)
from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graph_analytics_pipeline")

    # --- directed trade-flow graph with a scale-relative threshold ---
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    flow = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .agg(F.count_distinct("o_orderkey").alias("n"))
    )
    total = orders.agg(F.count(F.lit(1)).alias("total"))
    hot = (
        flow.crossJoin(F.broadcast(total))
        .filter(F.col("n") * 125 >= F.col("total"))
        .select("src", "dst")
    )
    scc = scc_labels(hot, n_hops=4)
    n_comp = scc.select("scc_id").distinct().count()
    biggest = (
        scc.groupBy("scc_id").count().orderBy(F.desc("count")).first()
    )
    print(f"trade loops: {n_comp} SCCs; largest loop has {biggest['count']} nations")

    weighted = flow.crossJoin(F.broadcast(total)).select(
        "src", "dst", F.expr("total div n").alias("w")
    )
    seeds = spark.range(1).select(F.lit(0).alias("node"))
    paths = sssp_weighted(weighted, seeds, n_sweeps=4)
    cheapest = paths.filter(F.col("node") != 0).orderBy("cost").limit(3).collect()
    print("cheapest supply paths from nation 0:",
          [(r.node, r.cost) for r in cheapest])

    # --- document near-dup graph: topology, communities, missing edges ---
    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)
    assort = degree_assortativity(edges, src_col="doc_a", dst_col="doc_b").first()
    print(f"dedup graph assortativity r={assort.r_corr:+.3f} "
          f"over {assort.n_edge_ends} edge ends "
          f"({'hub-to-hub' if assort.r_corr > 0 else 'hub-to-leaf'})")

    labels = label_propagation(edges, n_iter=2, src_col="doc_a", dst_col="doc_b")
    q = modularity(edges, labels, src_col="doc_a", dst_col="doc_b").first()
    print(f"label-prop communities: {q.n_communities} over {q.m_edges} edges, "
          f"modularity {q.q_ppm / 1e6:+.4f}")

    proposals = resource_allocation_link_prediction(
        edges, max_degree=64, src_col="doc_a", dst_col="doc_b"
    )
    top = proposals.orderBy(F.desc("ra_score")).limit(3).collect()
    print("top missing-edge proposals:",
          [(r.node_a, r.node_b, r.ra_score) for r in top])

    assert n_comp > 0 and q.m_edges > 0
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
