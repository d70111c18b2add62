"""Distributed k-means (operators/clustering.py).

Covers: refinement math vs an exact hand-computed update,
partitioning-independence of the refined centroids (the tie-class
discipline: decimal sums, driver-side division), empty-cell fallback,
Lloyd's monotone cost descent on real embeddings, and the end-to-end
kmeans_fit quality vs the init-only sample fit. Cross-engine value
parity for the full pipeline lives in test_rotated_parity.py
(``emb_kmeans_cells`` replays init + every iteration through DuckDB).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from etl_instagram_spark.operators.clustering import (
    assign_cells,
    kmeans_cost,
    kmeans_fit,
    refine_centroids,
)


def _toy(spark, parts: int = 4):
    # dyadic coordinates (multiples of 0.25): decimal-quantized sums and
    # float sums agree EXACTLY, so expected centroids are computable by
    # hand with no tolerance
    pts = [
        (0, [0.0, 0.0]),
        (1, [0.25, 0.0]),
        (2, [0.0, 0.25]),
        (3, [10.0, 10.0]),
        (4, [10.25, 10.0]),
        (5, [10.0, 10.25]),
    ]
    return spark.createDataFrame(
        pts, "vec_id int, embedding array<double>"
    ).repartition(parts)


def test_refine_matches_hand_computed_update(spark):
    df = _toy(spark)
    init = [[1.0, 1.0], [9.0, 9.0]]
    got = refine_centroids(df, init, n_iter=1)
    assert got[0] == [0.25 / 3, 0.25 / 3]
    assert got[1] == [30.25 / 3, 30.25 / 3]
    # a second iteration is a fixed point here (assignments can't move)
    assert refine_centroids(df, got, n_iter=1) == got


def test_refined_centroids_partitioning_independent(spark):
    init = [[1.0, 1.0], [9.0, 9.0]]
    a = refine_centroids(_toy(spark, parts=1), init, n_iter=2)
    b = refine_centroids(_toy(spark, parts=7), init, n_iter=2)
    assert a == b  # bit-exact, not approximately


def test_empty_cell_keeps_previous_centroid(spark):
    df = _toy(spark)
    # third centroid is far from every point -> receives no rows
    init = [[1.0, 1.0], [9.0, 9.0], [-100.0, -100.0]]
    got = refine_centroids(df, init, n_iter=1)
    assert got[2] == [-100.0, -100.0]
    assert got[0] == [0.25 / 3, 0.25 / 3]


def test_malformed_vectors_drop_out_of_update(spark):
    df = _toy(spark).unionByName(
        spark.createDataFrame(
            [(90, None), (91, [0.5]), (92, [0.5, None])],
            "vec_id int, embedding array<double>",
        )
    )
    assert refine_centroids(df, [[1.0, 1.0], [9.0, 9.0]], n_iter=1) == (
        refine_centroids(_toy(spark), [[1.0, 1.0], [9.0, 9.0]], n_iter=1)
    )


def test_assign_cells_and_cost_shapes(spark):
    df = _toy(spark)
    cents = [[0.1, 0.1], [10.1, 10.1]]
    cells = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(df, cents).select("vec_id", "cell").collect()
    }
    assert all(cells[i] == 0 for i in (0, 1, 2))
    assert all(cells[i] == 1 for i in (3, 4, 5))
    cost = kmeans_cost(df, cents).collect()
    assert [r["cell"] for r in cost] == [0, 1]
    assert all(r["n"] == 3 and r["sse"] >= 0.0 for r in cost)


def test_lloyd_descent_on_real_embeddings(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    from etl_instagram_spark.operators.similarity import fit_ivf_centroids

    init = fit_ivf_centroids(emb, n_clusters=6, seed=7, order_col="vec_id")

    def total_sse(cents):
        return sum(r["sse"] for r in kmeans_cost(emb, cents).collect())

    prev = total_sse(init)
    cur = init
    for _ in range(3):
        cur = refine_centroids(emb, cur, n_iter=1)
        now = total_sse(cur)
        # Lloyd's is monotone; 6dp element quantization can wiggle the
        # last digit, hence the epsilon
        assert now <= prev + 1e-3, (now, prev)
        prev = now


def test_kmeans_fit_beats_init_only(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    from etl_instagram_spark.operators.similarity import fit_ivf_centroids

    init = fit_ivf_centroids(
        emb, n_clusters=6, seed=7, max_fit_points=64, order_col="vec_id"
    )
    fitted = kmeans_fit(
        emb, k=6, seed=7, n_iter=3, init_points=64, order_col="vec_id"
    )
    sse = lambda c: sum(r["sse"] for r in kmeans_cost(emb, c).collect())  # noqa: E731
    # refinement over ALL rows must improve on a deliberately-starved
    # 64-point sample fit
    assert sse(fitted) <= sse(init)


def test_refine_rejects_negative_iterations(spark):
    with pytest.raises(ValueError):
        refine_centroids(_toy(spark), [[0.0, 0.0]], n_iter=-1)


def test_kmeans_cost_vectorized_path_matches_codegen(spark, sf_smoke):
    """Past the unroll limit kmeans_cost must dispatch to the NumPy path
    and (away from exact ties — real data) report the same per-cell
    profile the codegen path computes for the same centroids."""
    from etl_instagram_spark.operators.clustering import (
        _cell_sse_vectorized,
        kmeans_cost,
    )
    from etl_instagram_spark.operators.similarity import (
        _UNROLL_MAX_TERMS,
        fit_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    small = fit_ivf_centroids(emb, n_clusters=8, seed=7, order_col="vec_id")
    codegen = kmeans_cost(emb, small).collect()
    vec = (
        emb.select(_cell_sse_vectorized("embedding", small, 6).alias("a"))
        .select("a.cell", "a.sse")
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .orderBy("cell")
        .collect()
    )
    assert [(r["cell"], r["n"]) for r in codegen] == [
        (r["cell"], r["n"]) for r in vec
    ]
    # a quantizer past the limit must dispatch and finish
    big = fit_ivf_centroids(emb, n_clusters=80, seed=7, order_col="vec_id")
    assert 80 * len(big[0]) > _UNROLL_MAX_TERMS
    rows = kmeans_cost(emb, big).collect()
    assert sum(r["n"] for r in rows) == emb.where("embedding is not null").count()
    assert all(r["sse"] >= 0.0 for r in rows)


def test_nan_vectors_survive_vectorized_refine_and_cost(spark):
    """ADVICE r19 #1: under a LARGE quantizer (the vectorized ivf_cell
    regime) a NaN-element vector masks to a NULL cell inside the Arrow
    UDF; pre-r20 the NULL-cell group row crashed refine_centroids'
    driver update (cur[None]) and surfaced as a NULL-cell row in
    kmeans_cost. NaN rows must simply drop out, like malformed rows."""
    from etl_instagram_spark.operators.similarity import _UNROLL_MAX_TERMS

    dim = 8
    k = _UNROLL_MAX_TERMS // dim + 1  # first size past the unroll limit
    assert k * dim > _UNROLL_MAX_TERMS
    cents = [[float(i % 7), float(i % 5)] + [0.0] * (dim - 2) for i in range(k)]
    rows = [
        (0, [0.5] * dim),
        (1, [float("nan")] + [0.5] * (dim - 1)),  # NaN in the read window
        (2, [6.0, 4.0] + [0.0] * (dim - 2)),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cur = refine_centroids(df, cents, n_iter=1)
    assert len(cur) == k and all(len(c) == dim for c in cur)
    # the two valid rows moved their cells' centroids; the NaN row is out
    cost = kmeans_cost(df, cents).collect()
    assert all(r["cell"] is not None for r in cost)
    assert sum(r["n"] for r in cost) == 2
