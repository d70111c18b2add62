"""Embeddings/ANN rows of the rotated/never-gated EXTRAS parity ledger.

Split out of plans/parity_extras.py (r14) purely for navigability —
the registry (plans/extras_base.py), the compare loop
(tests/test_rotated_parity.py), and every row's (spark_fn, oracle_sql)
contract are unchanged. parity_extras.py keeps the ledger's charter
and rotation history and re-exports the public faces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_instagram_spark.plans.extras_base import EXTRAS, _llm
from etl_instagram_spark.plans.queries import _t


def _sql_ann_lsh_topk_extra() -> str:
    from etl_instagram_spark.plans.llm_queries import _sql_ann_lsh_topk

    return _sql_ann_lsh_topk()


def emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: top-5 cosine neighbors of vec_id=0 among vectors in
    its LSH bucket (r6 rotation; the bucket-filtered path stays gated
    via emb_ann_recall and emb_knn_join_recall)."""
    from etl_instagram_spark.plans.llm_queries import (
        _as_double,
        _bucket_col,
        _dot,
        _spread,
        _t,
    )

    emb = _spread(spark, _t(spark, sf_dir, "embeddings")).withColumn(
        "bucket", _bucket_col()
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("qv"), F.col("bucket").alias("qbucket")
    )
    v = _as_double(F.col("embedding"))
    cos = _dot(v, F.col("qv")) / (
        F.sqrt(_dot(v, v)) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != 0))
        .select("vec_id", "label", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(5)
    )


def _emb_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force single-query cosine top-10 (r6 rotation for
    emb_semantic_dedup; the exact-cosine surface stays gated via the
    ground-truth sides of emb_ann_recall / emb_knn_join_recall)."""
    return _llm("emb_knn_cosine")(spark, sf_dir)


def _emb_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r16): symmetric per-vector int8 scalar quantization
    (operators/similarity.quantize_embeddings) — the vector-store
    compression step between raw embeddings and the PQ/IVFADC index
    faces. Codes and scales are exact across engines by construction
    (correctly-rounded IEEE ops on identical parquet doubles, both
    engines round ties away from zero — no transcendental anywhere),
    so the per-vector profile (scale, code checksum/extrema, and the
    6-place reconstruction cosine via the pinned left-fold dot)
    replays bit-for-bit in DuckDB."""
    from etl_instagram_spark.operators.similarity import (
        dequantize_col,
        quantize_embeddings,
    )
    from etl_instagram_spark.plans.q_shared import _as_double, _dot

    emb = _t(spark, sf_dir, "embeddings")
    qz = quantize_embeddings(emb, "embedding", "vec_id")
    joined = qz.join(
        emb.select("vec_id", _as_double(F.col("embedding")).alias("v")),
        "vec_id",
    )
    d = dequantize_col(F.col("q"), F.col("scale"))
    cos = _dot(d, F.col("v")) / (
        F.sqrt(_dot(d, d)) * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    return joined.select(
        "vec_id",
        "scale",
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "q_sum"
        ),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        F.round(cos, 6).alias("recon_cos"),
    ).orderBy("vec_id")


def _sql_emb_int8_quantization() -> str:
    from etl_instagram_spark.operators.similarity import (
        dequantize_sql,
        quantize_sql,
    )

    scale, q = quantize_sql("vd")
    deq = dequantize_sql("q", "scale")
    return f"""
    WITH vv AS (SELECT vec_id,
                       list_transform(embedding, x -> x::DOUBLE) AS vd
                FROM embeddings),
    qz AS (SELECT vec_id, vd, {scale} AS scale, {q} AS q FROM vv),
    dq AS (SELECT vec_id, vd, scale, q, {deq} AS d FROM qz)
    SELECT vec_id, scale,
           (list_sum(q))::BIGINT AS q_sum,
           list_min(q) AS q_min,
           list_max(q) AS q_max,
           round(list_dot_product(d, vd)
                 / (sqrt(list_dot_product(d, d))
                    * sqrt(list_dot_product(vd, vd))), 6) AS recon_cos
    FROM dq
    ORDER BY vec_id
    """


def _register() -> None:
    from etl_instagram_spark.plans import llm_queries

    EXTRAS["emb_ann_lsh_topk"] = (emb_ann_lsh_topk, _sql_ann_lsh_topk_extra())
    EXTRAS["emb_knn_cosine"] = (_emb_knn_cosine, llm_queries.SQL_KNN_COSINE)
    # r9 rotation (for emb_ann_ivf_stored): the IVF recall formulation —
    # oracle callable because its centroid literals are fit from data
    EXTRAS["emb_ann_ivf_recall"] = (
        llm_queries.emb_ann_ivf_recall,
        llm_queries._ivf_oracle_sql,
    )
    # r13 rotation: multi-probe LSH recall (seat given to
    # events_funnel_levels — the driver gate now certifies the
    # behavioral family directly; the ANN family stays gated via
    # emb_ann_ivf_stored / emb_pq_recall / emb_knn_join_recall)
    EXTRAS["emb_ann_recall"] = (
        llm_queries.emb_ann_recall,
        llm_queries.SQL_EMB_ANN_RECALL,
    )
    # never-gated (r16): int8 scalar quantization — codes/scales exact
    # across engines, reconstruction cosine at 6 places
    EXTRAS["emb_int8_quantization"] = (
        _emb_int8_quantization,
        _sql_emb_int8_quantization,
    )


_register()
