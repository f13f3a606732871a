"""Approximate-nearest-neighbor search over embedding columns.

Three operators, in increasing scale-readiness:

- `cosine_topk`: brute-force exact top-k for one query vector. The
  plan is a map (per-row cosine, JVM-side array arithmetic) feeding
  `TakeOrderedAndProject` — each partition keeps only its local top-k
  and the driver merges k·partitions rows. No shuffle of the corpus;
  at 100 TB this is a single scan and the right exactness baseline.
- `hyperplane_buckets` / `ann_topk_lsh`: random-hyperplane (SimHash
  for vectors) bucketing. Sign bits of `dot(plane, v)` form a bucket
  id; a query probes only its own bucket (optionally Hamming-1
  neighbors), cutting the scan by ~2^planes. Buckets are a plain
  column — the bucketed corpus can be written `partitionBy(bucket)`
  so probes become partition-pruned scans.
- `knn_join`: exact k-NN for a (small, broadcastable) query set via
  broadcast nested-loop join + per-query window top-k. The window
  shuffles by query id — fine when queries ≪ corpus.

All cosines use explicit per-element double arithmetic in array-index
order, so DuckDB oracles reproduce results bit-for-bit (modulo the
shared ROUND(·, 6)).

Hyperplanes are module-level constants derived from a fixed seed, so
the Spark plan and the generated oracle SQL embed the *same* literal
planes.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Deterministic random hyperplanes (seed fixed): N_PLANES × DIM,
#: values in [-1, 1), rounded so the literals embed exactly in SQL.
N_PLANES = 4
EMBEDDING_DIM = 64


def make_planes(n_planes: int = N_PLANES, dim: int = EMBEDDING_DIM, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)
    ]


PLANES: list[list[float]] = make_planes()


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product in array-index order (IEEE-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def lit_vector(vec: Sequence[float]) -> Column:
    """A query vector as a literal array<double> column."""
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector; deterministic
    via (rounded cosine desc, id) ordering. Physical plan:
    scan → per-row cosine → TakeOrderedAndProject (no shuffle)."""
    q = lit_vector(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def hyperplane_signature(v: Column, planes: Sequence[Sequence[float]] = PLANES) -> Column:
    """LSH bucket id: bit i set iff dot(plane_i, v) >= 0.

    Plane dimensionality MUST equal the vector dimensionality
    (zip_with null-pads on mismatch, which would null the dot and
    silently bucket everything to 0 — pass `planes=make_planes(n, d)`
    for non-64-dim corpora)."""
    out = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        out = out + F.when(dot(lit_vector(plane), v) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("long")
    return out


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: Sequence[Sequence[float]] = PLANES,
) -> DataFrame:
    """Corpus with its LSH bucket column. Writing this
    `partitionBy("bucket")` turns every probe into a partition-pruned
    scan of ~1/2^planes of the data."""
    return df.withColumn("bucket", hyperplane_signature(F.col(vec_col), planes))


def _py_dot(a: Sequence[float], b: Sequence[float]) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def query_bucket(query_vec: Sequence[float], planes: Sequence[Sequence[float]] = PLANES) -> int:
    """Driver-side bucket id for a query vector (mirrors
    hyperplane_signature exactly)."""
    b = 0
    for i, plane in enumerate(planes):
        if _py_dot(plane, query_vec) >= 0:
            b |= 1 << i
    return b


def ann_topk_lsh(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: Sequence[Sequence[float]] = PLANES,
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket,
    then exact cosine rank within it. Recall < 1 by design; the
    partition-pruned scale path next to cosine_topk's full scan."""
    bucket = query_bucket(query_vec, planes)
    candidates = hyperplane_buckets(df, vec_col, planes).filter(
        F.col("bucket") == bucket
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def multiprobe_buckets(
    query_vec: Sequence[float],
    planes: Sequence[Sequence[float]] = PLANES,
    n_probes: int = 3,
) -> list[int]:
    """Multi-probe LSH probe sequence (Lv et al., VLDB'07, reduced to
    Hamming-1 perturbations): the home bucket first, then flips of the
    planes whose boundary the query sits closest to (smallest |dot|),
    tie-broken by plane index. Recovers most of the recall lost to
    boundary-straddling neighbors at the cost of n_probes bucket scans
    instead of one — still partition-pruned when the corpus is written
    partitionBy(bucket)."""
    home, margins = 0, []
    for i, plane in enumerate(planes):
        d = _py_dot(plane, query_vec)
        if d >= 0:
            home |= 1 << i
        margins.append((abs(d), i))
    probes = [home] + [home ^ (1 << i) for _, i in sorted(margins)]
    return probes[:n_probes]


def ann_topk_multiprobe(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_probes: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: Sequence[Sequence[float]] = PLANES,
) -> DataFrame:
    """Approximate top-k over the multi-probe bucket set: exact cosine
    rank within the union of the home bucket and its closest-margin
    Hamming-1 flips. Same single-scan shape as ann_topk_lsh — the
    bucket filter is an isin over ≤ n_probes literals, prunable at the
    source."""
    buckets = multiprobe_buckets(query_vec, planes, n_probes)
    candidates = hyperplane_buckets(df, vec_col, planes).filter(
        F.col("bucket").isin(buckets)
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact k-NN join: for every query row, the top-k corpus
    neighbors (self excluded) by cosine. The query side is broadcast
    (nested-loop join stays shuffle-free); the per-query top-k is a
    row_number window partitioned by query id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def semdedup_census(
    df: DataFrame,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: Sequence[Sequence[float]] = PLANES,
) -> DataFrame:
    """SemDeDup-style semantic pruning census (Abbas et al. 2023,
    arXiv:2303.09540), Spark-first: cluster the corpus with the
    deterministic hyperplane quantizer (the paper uses k-means; the
    LSH signature is the SQL-mirrorable stand-in with the same role —
    confine the O(n²) similarity test to small cells), then inside
    each bucket drop every vector that has a ≥ threshold cosine
    neighbor with a SMALLER id. The keep-lowest-id rule makes the
    retention decision a one-pass pairwise EXISTS — no sequential
    greedy chain — so it is deterministic, distributable, and
    oracle-checkable.

    Returns one row per bucket: (bucket, n_vectors, n_pruned, n_kept).

    Scale shape: norms are computed once per vector (O(n·d)); the pair
    stage is a bucket-equi-join, so all-pairs work is confined to
    single buckets (~n/2^planes rows each — add planes as the corpus
    grows); the shuffle carries (bucket, id, vec) once. No driver-side
    data, no cartesian.
    """
    with_cell = df.withColumn(
        "__cell", hyperplane_signature(F.col(vec_col), planes)
    )
    return semdedup_census_in_cells(
        with_cell, "__cell", threshold, vec_col, id_col, out_cell_col="bucket"
    )


def semdedup_census_in_cells(
    df: DataFrame,
    cell_col: str,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_cell_col: str = "cell_id",
) -> DataFrame:
    """The cell-generic core of semdedup_census: `df` arrives with a
    precomputed cell column (hyperplane bucket, k-means cluster id,
    IVF list — any bounded quantizer), and the keep-lowest-id pruning
    census runs within cells. Split out so the paper-exact k-means
    variant (semdedup_kmeans_cells, learned cells from
    similarity.kmeans) shares one pruning implementation with the
    LSH stand-in."""
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        nrm.alias("nrm"),
        F.col(cell_col).alias("bucket"),
    )
    a = base.select(
        F.col("bucket"),
        F.col("id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = base.select(
        F.col("bucket"),
        F.col("id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pair_cos = dot(F.col("v_a"), F.col("v_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    pruned = (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(pair_cos >= F.lit(float(threshold)))
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("is_pruned", F.lit(True))
    )
    return (
        base.join(pruned, ["id"], "left")
        .groupBy(F.col("bucket").alias(out_cell_col))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count(F.col("is_pruned")).alias("n_pruned"),
            (F.count(F.lit(1)) - F.count(F.col("is_pruned"))).alias("n_kept"),
        )
    )


def int8_quantize(v: Column) -> Column:
    """Symmetric int8 scalar quantization of a (double[]) vector:
    normalize to unit L2, then floor(127 * x̂) per element. The
    standard memory-bandwidth trick for billion-scale ANN — 4× smaller
    vectors than float32, and candidate scoring becomes exact integer
    arithmetic (engine- and order-portable, unlike float dots)."""
    nrm = l2_norm(v)
    return F.transform(v, lambda x: F.floor(127 * (x.cast("double") / nrm)))


def int8_dot(a8: Column, b8: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a8, b8, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
