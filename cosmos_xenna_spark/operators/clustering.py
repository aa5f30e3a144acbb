"""K-means clustering over an embedding column.

Closes the loop on the IVF similarity path: `operators/similarity.py`
uses the table's pre-assigned `label` as the coarse quantizer; this
module produces those cluster ids from raw vectors, so the full
production pipeline is  embed → kmeans_fit_assign → ivf_topk.

MLlib's KMeans runs distributed (per-partition Lloyd updates, driver
holds only k centroids — k << n, so this scales to any table whose
centroid set fits in memory, which is every practical k). Assignments
are verified by a pytest property (every point is assigned to its
nearest centroid), not a SQL oracle — MLlib's k-means|| init is
seed-deterministic only for a fixed partitioning, which an oracle
cannot assume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit_assign(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    seed: int = 42,
    max_iter: int = 20,
) -> tuple[DataFrame, list[list[float]]]:
    """Fit k-means and assign each row a cluster id.

    Returns (df + out_col, centroids). Input vectors are
    ``array<float/double>``; converted to MLlib vectors only at this
    boundary (everything else in the engine stays on plain arrays).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="__features").fit(with_vec)
    assigned = (
        model.transform(with_vec)
        .withColumnRenamed(model.getPredictionCol(), out_col)
        .drop("__features")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids
