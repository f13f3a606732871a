"""IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
quantizer over the embedding corpus.

The FAISS-style IVF layout, Spark-native:

1. **Train** (`build_ivf_index`): MLlib KMeans (distributed Lloyd's)
   learns `n_lists` centroids; every vector is assigned to its nearest
   centroid ("list"). Persist the assigned corpus
   `partitionBy("list_id")` and each probe becomes a partition-pruned
   scan.
2. **Search** (`ivf_search`): rank centroids against the query
   DRIVER-side (centroid table is tiny — n_lists × dim floats), take
   the `n_probe` nearest lists, scan only those lists with the exact
   cosine top-k kernel from ann.py.

Recall/cost dial: n_probe = n_lists ⇒ exact (full scan);
n_probe = 1 ⇒ fastest. Complements ann.py's hyperplane LSH: IVF
adapts to the data distribution (learned centroids) where LSH is
data-independent.

Not SQL-expressible (KMeans training) — catalog entry is rows-only;
recall-vs-exact is asserted in tests/test_similarity.py.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_delay_prediction_using_pyspark_spark.similarity.ann import cosine_topk


def build_ivf_index(
    df: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> tuple[list[list[float]], DataFrame]:
    """Fit the coarse quantizer and assign every vector to a list.
    Returns (centroids, corpus + `list_id` column)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = df.withColumn("__v", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter, featuresCol="__v", predictionCol="list_id")
    model = km.fit(with_vec)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    assigned = model.transform(with_vec).drop("__v")
    return centroids, assigned


def _euclidean(a: Sequence[float], b: Sequence[float]) -> float:
    return math.sqrt(sum((float(x) - float(y)) ** 2 for x, y in zip(a, b)))


def rank_lists(query_vec: Sequence[float], centroids: list[list[float]]) -> list[int]:
    """Centroid ids nearest-first for a query (driver-side: the
    centroid table is n_lists × dim — bytes, not data)."""
    return sorted(range(len(centroids)), key=lambda i: _euclidean(query_vec, centroids[i]))


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the `n_probe` nearest lists, exact cosine top-k within
    them. With the corpus written partitionBy('list_id'), the IN
    filter prunes partitions at plan time."""
    probes = rank_lists(query_vec, centroids)[:n_probe]
    candidates = assigned.filter(F.col("list_id").isin(probes))
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)
