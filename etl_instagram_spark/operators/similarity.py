"""Embedding similarity-search operators: brute-force cosine top-k and
hyperplane-LSH bucketed ANN.

Engine extension for training-data pipelines (SURVEY §7 step 11); the
reference has no vector surface. Everything is built-in array expressions
(``zip_with`` + ``aggregate``) — JVM-side, no UDF, no shuffle of the
embedding column.

Scale design (100 TB):
- ``cosine_topk``: broadcast ONE query vector, scan + TakeOrderedAndProject.
  Linear scan is the correct baseline; it parallelizes perfectly and is
  the recall=1.0 oracle for ANN variants.
- ``ann_lsh_topk``: prune the scan to the query's hyperplane bucket
  (~n/2^bits rows). At scale the table is written partitioned by bucket
  so the filter becomes partition pruning — the scan never reads the
  other buckets. Multi-probe (probe Hamming-adjacent buckets) raises
  recall without changing the plan shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential fold dot product over two array<double> columns."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Brute-force top-k by cosine similarity to a literal query vector."""
    v = as_double(F.col(vec_col))
    q = _query_lit(query_vec)
    return (
        df.select(id_col, F.round(cosine(v, q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_signs(bits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 parity (no PRNG state)."""
    return [
        [
            1 if int(hashlib.md5(f"hp:{j}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1
            for i in range(dim)
        ]
        for j in range(bits)
    ]


def lsh_bucket(vec_col: str, planes: list[list[int]]) -> Column:
    """Hyperplane-LSH bucket id: bit j = sign(v · plane_j)."""
    v = as_double(F.col(vec_col))
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        w = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(v, w) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _bucket_of(query_vec: list[float], planes: list[list[int]]) -> int:
    b = 0
    for j, plane in enumerate(planes):
        if sum(x * w for x, w in zip(query_vec, plane)) >= 0:
            b |= 1 << j
    return b


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multi_probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket
    (plus Hamming-adjacent buckets when multi_probe_hamming > 0), then
    exact cosine rank within the candidates."""
    planes = hyperplane_signs(bits, len(query_vec))
    qb = _bucket_of(query_vec, planes)
    if multi_probe_hamming > 0:
        probes = [b for b in range(1 << bits) if bin(b ^ qb).count("1") <= multi_probe_hamming]
    else:
        probes = [qb]
    v = as_double(F.col(vec_col))
    q = _query_lit(query_vec)
    return (
        df.withColumn("__bucket", lsh_bucket(vec_col, planes))
        .filter(F.col("__bucket").isin(probes))
        .select(id_col, F.round(cosine(v, q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def fit_ivf_centroids(
    df: DataFrame, vec_col: str = "embedding", n_clusters: int = 16, seed: int = 42
) -> list[list[float]]:
    """Fit IVF coarse centroids with seeded KMeans (pyspark.ml). At scale
    fit on a sample once and reuse the centroids across queries — the
    centroid list is O(n_clusters · dim), driver-sized by design."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(array_to_vector(as_double(F.col(vec_col))).alias("features"))
    model = KMeans(k=n_clusters, seed=seed).fit(feats)
    return [c.tolist() for c in model.clusterCenters()]


def _nearest_centroids(query_vec: list[float], centroids: list[list[float]], n_probe: int) -> list[int]:
    def sqdist(c):
        return sum((x - y) ** 2 for x, y in zip(query_vec, c))

    order = sorted(range(len(centroids)), key=lambda i: sqdist(centroids[i]))
    return order[:n_probe]


def _assign_cell(vec_col: str, centroids: list[list[float]]) -> Column:
    """Cell id = argmin squared distance to the centroids — a pure column
    expression over the literal centroid arrays (no model object shipped
    to executors, no UDF)."""
    v = as_double(F.col(vec_col))
    best_cell = F.lit(0)
    best_dist = None
    for i, c in enumerate(centroids):
        w = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, w, lambda a, b: (a - b) * (a - b)), F.lit(0.0), lambda acc, x: acc + x
        )
        if best_dist is None:
            best_dist = d
        else:
            cond = d < best_dist
            best_cell = F.when(cond, F.lit(i)).otherwise(best_cell)
            best_dist = F.when(cond, d).otherwise(best_dist)
    return best_cell


def ann_ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` cells whose centroids
    are nearest the query, exact cosine rank within the probed cells.

    Scale path: the table is written partitioned by cell id, so the probe
    filter becomes partition pruning (reads n_probe/n_clusters of the
    data); raising n_probe trades scan for recall, same plan shape."""
    probes = _nearest_centroids(query_vec, centroids, n_probe)
    v = as_double(F.col(vec_col))
    q = _query_lit(query_vec)
    return (
        df.withColumn("__cell", _assign_cell(vec_col, centroids))
        .filter(F.col("__cell").isin(probes))
        .select(id_col, F.round(cosine(v, q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
