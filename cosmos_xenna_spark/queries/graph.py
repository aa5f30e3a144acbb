"""Graph analytics query: fixed-point PageRank over the nation-level
trade graph (customer nation -> supplier nation, derived from
lineitem/orders/customer/supplier).  Integer fixed-point arithmetic
makes the 3-iteration result bit-exact against the unrolled-CTE
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.graph import (
    label_propagation_sql,
    pagerank_fixed,
    pagerank_fixed_sql,
    pagerank_weighted_sql,
)
from cosmos_xenna_spark.queries import register

_EDGES_SQL = """
    SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .distinct()
    )


@register(
    "q_pagerank",
    oracle=pagerank_fixed_sql(_EDGES_SQL, n_iter=3),
    description="3-iteration fixed-point PageRank on the nation trade graph "
    "(iterative joins; rank table stays per-node sized)",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank_fixed(_edges(spark, sf_dir), n_iter=3)
    return ranks.select(F.col("node").cast("bigint").alias("node"), "rank_fp")


@register(
    "q_triangle_count",
    oracle=f"""
    WITH und AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM ({_EDGES_SQL}) WHERE src <> dst
    ),
    deg AS (
      SELECT n, COUNT(*) AS d
      FROM (SELECT u AS n FROM und UNION ALL SELECT v FROM und)
      GROUP BY n
    ),
    o AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS x,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS y
      FROM und JOIN deg du ON und.u = du.n JOIN deg dv ON und.v = dv.n
    )
    SELECT COUNT(*) AS n_triangles
    FROM o o1 JOIN o o2 ON o1.y = o2.x
    WHERE EXISTS (SELECT 1 FROM o o3 WHERE o3.x = o1.x AND o3.y = o2.y)
    """,
    description="degree-ordered triangle counting on the nation trade graph "
    "(each edge oriented low->high by (degree, node); wedge join fan-out "
    "bounded O(sqrt(m)) per node)",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import triangle_count

    return triangle_count(_edges(spark, sf_dir))


_WEIGHTED_EDGES_SQL = """
    SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(*) AS w
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
    GROUP BY 1, 2
"""


def _weighted_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


@register(
    "q_pagerank_weighted",
    oracle=pagerank_weighted_sql(_WEIGHTED_EDGES_SQL, n_iter=3),
    description="trade-volume-weighted fixed-point PageRank: per-edge rank "
    "shares quantized to ppm (overflow-safe integer arithmetic, bit-exact)",
)
def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranks = pagerank_fixed(_weighted_edges(spark, sf_dir), n_iter=3, weight_col="w")
    return ranks.select(F.col("node").cast("bigint").alias("node"), "rank_fp")


@register(
    "q_label_propagation",
    oracle=label_propagation_sql(_EDGES_SQL, n_iter=2),
    description="synchronous label propagation (2 sweeps) on the nation "
    "trade graph — per sweep one node-sized label join + count + max_by "
    "reduction; all-integer with (count, min-label) tie-break, bit-exact "
    "vs the unrolled SQL oracle",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import label_propagation

    labels = label_propagation(_edges(spark, sf_dir), n_iter=2)
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("label"),
    )


def _doc_pairs_edges_sql() -> str:
    from cosmos_xenna_spark.queries.dedup import _BUCKETS_SQL

    return f"""
    SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
    FROM ({_BUCKETS_SQL}) a JOIN ({_BUCKETS_SQL}) b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """


def _doc_pairs_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.dedup import minhash_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(docs, "text", n_hashes=16, band_size=4, k=3)


from cosmos_xenna_spark.operators.graph import bfs_hops_sql, k_core_sql  # noqa: E402


@register(
    "q_kcore",
    oracle=k_core_sql(_doc_pairs_edges_sql(), k=2, n_sweeps=4),
    description="2-core of the document near-duplicate graph (LSH candidate "
    "pairs as edges): 4 synchronous peel sweeps dropping degree<2 nodes — "
    "chains and pendant docs peel away, near-clique duplicate communities "
    "survive; fixed-sweep result bit-exact vs the unrolled SQL oracle",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import k_core

    edges = _doc_pairs_edges(spark, sf_dir)
    return k_core(edges, k=2, n_sweeps=4, src_col="doc_a", dst_col="doc_b")


@register(
    "q_bfs_hops",
    oracle=bfs_hops_sql(
        _doc_pairs_edges_sql(),
        "SELECT doc_id AS node FROM documents WHERE doc_id % 97 = 0",
        n_hops=3,
    ),
    description="multi-source BFS hop distance on the document "
    "near-duplicate graph from a seed set (doc_id % 97 == 0): 3 min-plus "
    "sweeps, frontier table one row per reached node; exact integer "
    "parity with the unrolled SQL oracle",
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import bfs_hops

    edges = _doc_pairs_edges(spark, sf_dir)
    seeds = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0
    ).select(F.col("doc_id").alias("node"))
    return bfs_hops(edges, seeds, n_hops=3, src_col="doc_a", dst_col="doc_b")


from cosmos_xenna_spark.operators.graph import k_truss_sql  # noqa: E402


@register(
    "q_ktruss",
    oracle=k_truss_sql(_doc_pairs_edges_sql(), k=3, n_sweeps=3),
    description="3-truss of the document near-duplicate graph: 3 "
    "synchronous peel sweeps dropping edges in no surviving triangle — "
    "triangle-certified duplicate communities remain, hub-chained "
    "false positives fall away; per-edge support via the two-join "
    "wedge count, edge frames checkpointed per sweep, bit-exact vs "
    "the unrolled SQL oracle",
)
def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import k_truss

    edges = _doc_pairs_edges(spark, sf_dir)
    return k_truss(edges, k=3, n_sweeps=3, src_col="doc_a", dst_col="doc_b")


from cosmos_xenna_spark.operators.graph import hits_fixed_sql  # noqa: E402

_TRADE_EDGES_SQL = """
    SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 1000000 AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


@register(
    "q_hits",
    oracle=hits_fixed_sql(_TRADE_EDGES_SQL, n_iter=3),
    description="HITS hubs & authorities on the directed supplier->customer "
    "trade graph (3 iterations, int64 fixed point, quantized-divisor max "
    "norm — no overflow, bit-exact vs the unrolled SQL oracle): per "
    "iteration two edge equi-joins + two keyed aggregations, loop-invariant "
    "edge list checkpointed once, score frames rotated per iteration",
)
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import hits_fixed

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_suppkey").alias("src"),
        (F.col("o_custkey") + 1000000).alias("dst"),
    )
    return hits_fixed(edges, n_iter=3)


from cosmos_xenna_spark.operators.graph import personalized_pagerank_sql  # noqa: E402


@register(
    "q_ppr",
    oracle=personalized_pagerank_sql(
        f"""SELECT src, dst FROM ({_doc_pairs_edges_sql()})
            UNION ALL
            SELECT dst, src FROM ({_doc_pairs_edges_sql()})""",
        "SELECT DISTINCT doc_id AS node FROM documents WHERE doc_id % 97 = 0",
        n_iter=3,
    ),
    description="personalized PageRank from a seed document set over the "
    "near-duplicate graph (seed-expansion / related-item retrieval): "
    "teleport mass restarts only at seeds, unreachable nodes score exactly "
    "0; int64 fixed point, broadcast SpMV, per-iteration checkpoints — "
    "bit-exact vs the unrolled SQL oracle",
)
def q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import personalized_pagerank

    edges = _doc_pairs_edges(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0
    ).select(F.col("doc_id").alias("node"))
    return personalized_pagerank(sym, seeds, n_iter=3)


from cosmos_xenna_spark.operators.graph import (  # noqa: E402
    resource_allocation_sql,
    scc_labels_sql,
    sssp_weighted_sql,
)

# Directed nation trade graph with a SCALE-RELATIVE volume threshold:
# an edge supplier-nation -> customer-nation exists when its distinct
# order count clears 1/125 of all orders (n * 125 >= total avoids the
# division-rounding split between engines).  The threshold keeps edge
# density roughly constant as the fact tables grow, so the SCC
# structure stays non-trivial at every sf (measured: 199 edges at
# sf0.001, 136 at sf0.01 with a 9-nation cycle plus singletons).
_TRADE_FLOW_SQL = """
    SELECT src, dst, n FROM (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             COUNT(DISTINCT o.o_orderkey) AS n
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2
    )
"""


def _trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count_distinct("o_orderkey").alias("n"))
    )


def _total_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("total")
    )


@register(
    "q_scc",
    oracle=scc_labels_sql(
        f"""SELECT src, dst FROM ({_TRADE_FLOW_SQL})
            WHERE n * 125 >= (SELECT COUNT(*) FROM orders)""",
        n_hops=4,
    ),
    description="strongly connected components of the directed "
    "high-volume trade-flow graph (trade-loop detection): 4-hop forward "
    "+ backward closures, SCC label = min of their INTERSECTION — the "
    "(F,B) min-pair shortcut is provably wrong and rejected in the "
    "operator docstring; bit-exact vs the unrolled SQL oracle",
)
def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import scc_labels

    flow = _trade_flow(spark, sf_dir)
    edges = (
        flow.crossJoin(F.broadcast(_total_orders(spark, sf_dir)))
        .filter(F.col("n") * 125 >= F.col("total"))
        .select("src", "dst")
    )
    return scc_labels(edges, n_hops=4)


@register(
    "q_sssp_weighted",
    oracle=sssp_weighted_sql(
        f"""SELECT src, dst,
               (SELECT COUNT(*) FROM orders) // n AS w
            FROM ({_TRADE_FLOW_SQL})""",
        "SELECT 0 AS node",
        n_sweeps=4,
    ),
    description="weighted shortest path (4 Bellman-Ford min-plus sweeps) "
    "from nation 0 over the full trade-flow graph with inverse-volume "
    "edge costs (busy routes are cheap): cheapest-supply-path analysis; "
    "exact bigint min-plus, bit-exact vs the unrolled SQL oracle",
)
def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import sssp_weighted

    flow = _trade_flow(spark, sf_dir)
    edges = flow.crossJoin(F.broadcast(_total_orders(spark, sf_dir))).select(
        "src", "dst", F.expr("total div n").alias("w")
    )
    seeds = edges.sparkSession.range(1).select(F.lit(0).alias("node"))
    return sssp_weighted(edges, seeds, n_sweeps=4)


@register(
    "q_link_prediction_ra",
    oracle=resource_allocation_sql(_doc_pairs_edges_sql(), max_degree=64),
    description="resource-allocation link prediction on the document "
    "near-duplicate graph: for non-adjacent pairs sharing neighbors, "
    "ra_score = sum(1e9 div deg(z)) over common neighbors z (deg <= 64 "
    "hub cap — wedge count is sum(deg^2), the cap is what survives "
    "100 TB); one wedge join + anti-join, integer-exact",
)
def q_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import (
        resource_allocation_link_prediction,
    )

    edges = _doc_pairs_edges(spark, sf_dir)
    return resource_allocation_link_prediction(
        edges, max_degree=64, src_col="doc_a", dst_col="doc_b"
    )


from cosmos_xenna_spark.operators.graph import (  # noqa: E402
    dag_layers_sql,
    degree_assortativity_sql,
    modularity_sql,
)


@register(
    "q_modularity",
    oracle=modularity_sql(
        _doc_pairs_edges_sql(),
        label_propagation_sql(_doc_pairs_edges_sql(), n_iter=2),
    ),
    description="Newman modularity of the label-propagation communities on "
    "the document near-duplicate graph, exact ppm (all-bigint 4m*sum(e_c) "
    "- sum(d_c^2) over 4m^2 form): the is-this-clustering-better-than-"
    "chance gate for dedup community output; two label joins + community-"
    "sized aggs",
)
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    edges = _doc_pairs_edges(spark, sf_dir)
    labels = label_propagation(edges, n_iter=2, src_col="doc_a", dst_col="doc_b")
    return modularity(edges, labels, src_col="doc_a", dst_col="doc_b")


@register(
    "q_degree_assortativity",
    oracle=degree_assortativity_sql(_doc_pairs_edges_sql()),
    description="degree assortativity of the near-duplicate graph (Newman "
    "2002): Pearson correlation of endpoint degrees — hub-to-hub vs "
    "hub-to-leaf topology fingerprint that picks the salting strategy; "
    "integer moment sums, ONE mirrored double-op finish (the linreg "
    "precedent)",
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import degree_assortativity

    edges = _doc_pairs_edges(spark, sf_dir)
    return degree_assortativity(edges, src_col="doc_a", dst_col="doc_b")


@register(
    "q_dag_layers",
    oracle=dag_layers_sql(_doc_pairs_edges_sql(), n_sweeps=4),
    description="longest-path DAG layering (max-plus sweeps) of the "
    "id-ordered near-duplicate pair graph — dependency depth / critical-"
    "path staging; the max-plus dual of BFS, frontier one row per node, "
    "bit-exact vs the unrolled SQL oracle",
)
def q_dag_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import dag_layers

    edges = _doc_pairs_edges(spark, sf_dir)
    return dag_layers(edges, n_sweeps=4, src_col="doc_a", dst_col="doc_b")


from cosmos_xenna_spark.operators.graph import (  # noqa: E402
    clustering_coefficient_sql,
)


@register(
    "q_clustering_coeff",
    oracle=clustering_coefficient_sql(_doc_pairs_edges_sql(), max_degree=64),
    description="local clustering coefficient per node of the document "
    "near-duplicate graph, exact ppm (10^6 * triangles div C(deg,2)): "
    "separates near-clique duplicate communities (cc->1) from chain-shaped "
    "LSH false-positive paths (cc->0) per node; neighbor-wedge self-join + "
    "one close-edge equi-join, deg<=64 hub cap (wedges are sum(deg^2))",
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import clustering_coefficient

    edges = _doc_pairs_edges(spark, sf_dir)
    return clustering_coefficient(
        edges, src_col="doc_a", dst_col="doc_b", max_degree=64
    )


from cosmos_xenna_spark.operators.graph import (  # noqa: E402
    eccentricity_probes_sql,
)


@register(
    "q_eccentricity_probes",
    oracle=eccentricity_probes_sql(
        _doc_pairs_edges_sql(),
        "SELECT doc_id AS node FROM documents WHERE doc_id % 500 = 0",
        n_hops=4,
    ),
    description="multi-probe eccentricity profile of the near-duplicate "
    "graph (one BFS per probe run simultaneously, state keyed by "
    "(probe, node)): per reached node, probes reached / max probe "
    "distance (eccentricity lower bound, the iFUB diameter primitive) / "
    "nearest-probe hops; 4 sweeps, bit-exact vs the unrolled oracle",
)
def q_eccentricity_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import eccentricity_probes

    edges = _doc_pairs_edges(spark, sf_dir)
    seeds = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 500 == 0)
        .select(F.col("doc_id").alias("node"))
    )
    return eccentricity_probes(
        edges, seeds, n_hops=4, src_col="doc_a", dst_col="doc_b"
    )


from cosmos_xenna_spark.operators.graph import (  # noqa: E402
    harmonic_centrality_probes_sql,
    jaccard_link_prediction_sql,
)


@register(
    "q_harmonic_centrality_probes",
    oracle=harmonic_centrality_probes_sql(
        _doc_pairs_edges_sql(),
        "SELECT doc_id AS node FROM documents WHERE doc_id % 500 = 0",
        n_hops=4,
    ),
    description="probe-panel harmonic centrality of the near-duplicate "
    "graph (the HyperBall estimator's seed-panel form, handles "
    "disconnection): per node, probes reached + sum(1e6 div d) over "
    "the panel — exact integers, same simultaneous-BFS frontier as "
    "the eccentricity probes; 4 sweeps, bit-exact vs unrolled oracle",
)
def q_harmonic_centrality_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import harmonic_centrality_probes

    edges = _doc_pairs_edges(spark, sf_dir)
    seeds = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 500 == 0)
        .select(F.col("doc_id").alias("node"))
    )
    return harmonic_centrality_probes(
        edges, seeds, n_hops=4, src_col="doc_a", dst_col="doc_b"
    )


@register(
    "q_link_prediction_jaccard",
    oracle=jaccard_link_prediction_sql(_doc_pairs_edges_sql(), max_degree=64),
    description="neighbor-set Jaccard link prediction on the document "
    "near-duplicate graph: 1e6*|common| div (deg_a+deg_b-|common|) for "
    "non-adjacent wedge-connected pairs — same deg<=64 hub-capped "
    "wedge join as the RA index (sum(deg^2) is the wedge count), true "
    "endpoint degrees via two equi-joins on the degree table",
)
def q_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.graph import jaccard_link_prediction

    edges = _doc_pairs_edges(spark, sf_dir)
    return jaccard_link_prediction(
        edges, max_degree=64, src_col="doc_a", dst_col="doc_b"
    )
