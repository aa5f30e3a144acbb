"""Similarity-search queries with DuckDB oracles.

Spark computes dot products left-to-right in double (F.aggregate);
DuckDB's list_cosine_similarity over DOUBLE[] accumulates identically,
so even the floating-point similarity scores hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmos_xenna_spark.catalog import load_table
from cosmos_xenna_spark.operators.similarity import (
    cosine_topk_bruteforce,
    embedding_near_dup_pairs,
    ivf_topk,
    srp_lsh_signatures,
    srp_lsh_signatures_sql,
)
from cosmos_xenna_spark.queries import register

_DIM = 64
_N_QUERIES = 10
_K = 5


@register(
    "q_knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
         c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings)
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
      SELECT query_id, neighbor_id,
             list_cosine_similarity(qv, cv) AS sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY list_cosine_similarity(qv, cv) DESC,
                                         neighbor_id) AS rank
      FROM q, c WHERE neighbor_id <> query_id
    ) WHERE rank <= {_K}
    """,
    description="exact brute-force cosine top-5 neighbors for 10 query vectors",
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk_bruteforce(emb, queries, k=_K)


def _ivf_oracle() -> str:
    cent_sums = ",\n             ".join(
        f"CAST(CAST(SUM(CAST(v[{i + 1}] AS DECIMAL(28,12))) AS STRING) AS DOUBLE) / COUNT(*) AS m{i}"
        for i in range(_DIM)
    )
    cent_array = ", ".join(f"m{i}" for i in range(_DIM))
    return f"""
    WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT label AS cluster, {cent_sums} FROM c GROUP BY label),
    cent2 AS (SELECT cluster, [{cent_array}] AS centroid FROM cent),
    q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {_N_QUERIES}),
    probes AS (
      SELECT query_id, qv, cluster FROM (
        SELECT q.query_id, q.qv, cent2.cluster,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY list_cosine_similarity(qv, centroid) DESC,
                                           cluster) AS cr
        FROM q, cent2
      ) WHERE cr <= 2
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(p.qv, c.v) AS sim
      FROM probes p JOIN c ON c.label = p.cluster
      WHERE c.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, sim FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_K}
    """


@register(
    "q_knn_ivf",
    oracle=_ivf_oracle(),
    description="IVF approximate top-5: probe the 2 nearest clusters "
    "(decimal-exact centroids) then exact search within them",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(emb, queries, k=_K, n_probe=2)


@register(
    "q_knn_ivf_kmeans",
    oracle=None,  # k-means|| init is seed-deterministic only per
    # partitioning — not SQL-reproducible; correctness is pinned by the
    # recall property test (tests/test_clustering.py) instead.
    description="full production ANN pipeline: k-means over raw vectors "
    "(MLlib, distributed Lloyd) -> IVF probe search over the learned "
    "clusters — embed -> kmeans_fit_assign -> ivf_topk end-to-end",
)
def q_knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.clustering import kmeans_fit_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_fit_assign(emb, k=8, vec_col="embedding")
    queries = assigned.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(
        assigned, queries, k=_K, n_probe=2, cluster_col="cluster"
    )


@register(
    "q_embedding_stats",
    oracle="""
    SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(v[1] AS DECIMAL(28,12))) AS STRING) AS DOUBLE) / COUNT(*) AS mean_d0,
           MIN(len(v)) AS min_dim, MAX(len(v)) AS max_dim
    FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    GROUP BY label
    """,
    description="embedding-table hygiene stats: per-cluster counts, mean of "
    "dim-0 (decimal-exact), dimension bounds",
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.element_at("embedding", 1).cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_d0"),
        F.min(F.size("embedding")).cast("bigint").alias("min_dim"),
        F.max(F.size("embedding")).cast("bigint").alias("max_dim"),
    )


@register(
    "q_dedup_embedding_cosine",
    oracle="""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings)
    SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
           list_cosine_similarity(a.v, b.v) AS sim
    FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    """,
    description="embedding-cosine near-dup pairs: within-cluster blocking "
    "(one equi-join shuffle, never all-pairs), survivor = lower id",
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # 0.3 is "near-dup" at this synthetic table's similarity scale
    # (within-cluster cosines top out ~0.47); production would use ~0.95.
    return embedding_near_dup_pairs(emb, threshold=0.3)


@register(
    "q_semantic_dedup_keep",
    oracle="""
    WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    dups AS (
      SELECT DISTINCT b.vec_id AS vec_id
      FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    )
    SELECT e.vec_id, CAST(e.label AS BIGINT) AS label
    FROM embeddings e LEFT JOIN dups d ON d.vec_id = e.vec_id
    WHERE d.vec_id IS NULL
    """,
    description="SemDeDup-style semantic dedup keep-set: drop any vector "
    "with cosine >= 0.3 to a lower-id vector in its cluster block; "
    "returns the kept rows",
)
def q_semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.similarity import semantic_dedup_keep

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_keep(emb, threshold=0.3).select(
        "vec_id", F.col("label").cast("bigint").alias("label")
    )


@register(
    "q_srp_lsh",
    oracle=srp_lsh_signatures_sql("embeddings", n_planes=16, dim=64),
    description="sign-random-projection LSH signatures (16 hyperplanes): "
    "row-local cosine bucketing, zero shuffles; literal integer-valued "
    "planes keep the dot-product signs engine-exact",
)
def q_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return srp_lsh_signatures(emb, n_planes=16, dim=64)


@register(
    "q_semantic_dedup_srp",
    oracle=f"""
    WITH sig AS ({srp_lsh_signatures_sql("embeddings", n_planes=8, dim=64)}),
    c AS (
      SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, s.signature
      FROM embeddings e JOIN sig s ON e.vec_id = s.vec_id
    ),
    dups AS (
      SELECT DISTINCT b.vec_id AS vec_id
      FROM c a JOIN c b ON a.signature = b.signature AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.2
    )
    SELECT e.vec_id
    FROM embeddings e LEFT JOIN dups d ON d.vec_id = e.vec_id
    WHERE d.vec_id IS NULL
    """,
    description="label-free semantic dedup: SRP signatures as the near-dup "
    "blocks (row-local bucketing, no clustering pass needed; the oracle "
    "mirrors the signature computation, verifying the approximate algorithm "
    "exactly)",
)
def q_semantic_dedup_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.similarity import semantic_dedup_srp

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_srp(emb, threshold=0.2, n_planes=8, dim=64).select("vec_id")


@register(
    "q_knn_pq",
    oracle=None,  # PQ codebooks come from seed-dependent k-means fits —
    # not SQL-reproducible; correctness is pinned by the ADC-exactness
    # and post-rerank recall property tests (tests/test_pq.py).
    description="product-quantization ANN: per-subspace codebooks (fit on "
    "a hash-sample) -> 8-byte PQ codes -> ADC table-lookup shortlist -> "
    "exact re-rank of candidates only — the IVF+PQ compression path for "
    "billion-vector corpora (raw vectors touched for ~shortlist rows per "
    "query)",
)
def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.pq import pq_encode, pq_fit, pq_topk_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < _N_QUERIES).collect()
    queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in qrows]
    books = pq_fit(emb, m=8, k=16, sample_denom=2)
    enc = pq_encode(emb, books)
    return pq_topk_rerank(enc, emb, books, queries, k_top=_K, shortlist=50)


@register(
    "q_knn_ivf_pq",
    oracle=None,  # coarse cells AND codebooks are seed-dependent
    # k-means fits; pinned by the composed recall property test
    # (tests/test_pq.py::test_ivf_pq_recall_on_planted_clusters).
    description="FAISS-style IVFPQ composed from engine operators: "
    "k-means coarse cells -> per-query n_probe cell pruning (broadcast "
    "probe list) -> ADC table lookups over 8-byte codes -> exact "
    "re-rank of the shortlist — the corpus-wide pass touches "
    "n_probe/n_clusters of the codes and no raw vectors",
)
def q_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cosmos_xenna_spark.operators.pq import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < _N_QUERIES).collect()
    queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in qrows]
    return ivf_pq_topk(emb, queries, k_top=_K, n_clusters=8, n_probe=2, m=8, k_codes=16)


@register(
    "q_label_centroids",
    oracle="""
    WITH dims AS (
      SELECT CAST(label AS BIGINT) AS label,
             CAST(d.i AS BIGINT) AS dim,
             CAST(FLOOR(d.x * 1000000000.0) AS BIGINT) AS v_fp
      FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
           LATERAL (SELECT UNNEST(e) AS x, generate_subscripts(e, 1) AS i) d
    )
    SELECT label, dim,
           CAST(CAST(SUM(v_fp) AS STRING) AS DOUBLE) / (1000000000.0 * COUNT(*)) AS centroid_v,
           COUNT(*) AS n
    FROM dims GROUP BY label, dim
    """,
    description="per-label embedding centroids in long (label, dim, value) "
    "form — dimensions quantized to exact 1e-9 fixed-point BEFORE summing "
    "(floor(x*1e9): identical IEEE ops in any engine; a double->decimal "
    "cast would round differently across engines, and float accumulation "
    "is order-dependent), integer sums map-side combined; the coarse-"
    "centroid build step for IVF/semantic-dedup as pure aggregation",
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.col("label").cast("bigint").alias("label"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("__pos", "__x"),
    ).select(
        "label",
        (F.col("__pos") + 1).cast("bigint").alias("dim"),
        F.floor(F.col("__x") * F.lit(1000000000.0)).cast("bigint").alias("v_fp"),
    )
    return dims.groupBy("label", "dim").agg(
        (
            F.sum("v_fp").cast("double")
            / (F.lit(1000000000.0) * F.count(F.lit(1)))
        ).alias("centroid_v"),
        F.count(F.lit(1)).alias("n"),
    )


from cosmos_xenna_spark.operators.similarity import (  # noqa: E402
    cosine,
    mutual_nearest_pairs,
    mutual_nearest_pairs_sql,
)

_MNN_N = 300


@register(
    "q_mutual_nn",
    oracle=mutual_nearest_pairs_sql(
        f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < {_MNN_N} AND b.vec_id < {_MNN_N}
        """
    ),
    description="reciprocal-best-match (mutual nearest neighbor) pairs by "
    "cosine over a bounded vector subset: each side is the other's single "
    "best match — the high-precision entity-linkage rule; the reduction "
    "(symmetrize, per-id top-1 window, id-count-sized self-join) composes "
    "with any candidate generator (LSH/IVF at scale); float sims are "
    "bit-exact vs DuckDB's list_cosine_similarity",
)
def q_mutual_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _MNN_N)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cand = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine("va", "vb"))
        .select("id_a", "id_b", "sim")
    )
    return mutual_nearest_pairs(cand)


from cosmos_xenna_spark.operators.similarity import (  # noqa: E402
    quantize_embeddings_int8,
    quantize_embeddings_int8_sql,
)


@register(
    "q_embedding_quantize",
    oracle="SELECT vec_id, array_to_string(codes, ',') AS codes_csv, "
    "n_dims, max_abs_milli FROM ("
    + quantize_embeddings_int8_sql("SELECT vec_id, embedding FROM embeddings")
    + ")",
    description="symmetric int8 embedding quantization: per vector "
    "floor(x*127/max_abs) codes + floor(1000*max_abs) scale — the 4x "
    "memory / SIMD-dot compression before sharding a billion-vector ANN "
    "index; row-local (zero shuffle), float->double widening exact, "
    "floor not round (round-half rules differ across engines). Codes "
    "emitted as a comma-joined string: the registry's output-dtype "
    "contract is scalar-only columns (the external driver's pandas "
    "canonicalizer sort_values-es every column; ndarray cells are "
    "unhashable), enforced by test_registry_outputs_scalar_only",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = quantize_embeddings_int8(emb)
    return q.select(
        "vec_id",
        F.array_join(F.col("codes").cast("array<string>"), ",").alias("codes_csv"),
        "n_dims",
        "max_abs_milli",
    )


from cosmos_xenna_spark.operators.similarity import (  # noqa: E402
    centroid_outliers,
    centroid_outliers_sql,
)


@register(
    "q_centroid_outliers",
    oracle=centroid_outliers_sql("SELECT vec_id, embedding, label FROM embeddings"),
    description="noisy-label screen: per label, the 5 vectors farthest from "
    "their own label centroid (exact 1e-6 fixed-point squared distance; "
    "centroid re-quantized to the grid with one IEEE divide) — the "
    "mislabel/OOD curation pass before cluster-blocked dedup or IVF trusts "
    "the labels; one (label, dim) window exchange serves both centroid "
    "moments, output k x n_labels rows",
)
def q_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_outliers(emb, k=5)


from cosmos_xenna_spark.operators.similarity import (  # noqa: E402
    embedding_dim_variance,
    embedding_dim_variance_sql,
    truncation_recall,
    truncation_recall_sql,
)


@register(
    "q_embedding_dim_variance",
    oracle=embedding_dim_variance_sql("SELECT embedding FROM embeddings"),
    description="per-dimension variance profile of the embedding corpus "
    "(the truncation / matryoshka / PCA-lite dimensionality audit): exact "
    "integer moments over floor(x*1000) quantized values per dimension — "
    "mean in milli-grid-units, population variance numerator over n^2 in "
    "grid-units squared, variance rank; one posexplode + map-side-combined "
    "64-group agg, DECIMAL(38) moments (the CUPED convention), rank window "
    "on the 64-row dim frame only",
)
def q_embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    return embedding_dim_variance(emb)


@register(
    "q_embedding_truncation_recall",
    oracle=truncation_recall_sql(
        "SELECT vec_id, embedding FROM embeddings", dims=(8, 16, 64)
    ),
    description="matryoshka truncation-quality eval (Kusupati et al.): for "
    "8 probe vectors and prefix lengths d in {8,16,64}, top-5 neighbors by "
    "exact integer dot product over floor(x*1000) quantized prefixes, "
    "recall vs the full-dimension top-5 in exact ppm — the 'can we serve "
    "the index at d=16' measurement; probes x prefix-lengths broadcast "
    "against the corpus, one scored pass + per-(query,d) top-k windows, "
    "never an all-pairs join",
)
def q_embedding_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return truncation_recall(emb, dims=(8, 16, 64))
