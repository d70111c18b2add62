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


_register()
