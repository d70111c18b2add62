"""Tests for the trained quality classifier (enrich/quality_model.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.enrich.quality_model import (
    QUALITY_FEATURES,
    fit_quality_classifier,
    quality_feature_cols,
    quality_model_filter,
    quality_model_score,
)

GOOD = [
    "The distributed planner rewrites each declarative query into a "
    "physical plan that streams columnar batches through generated code.",
    "Researchers measured the effect of caching on tail latency and "
    "found that admission policies matter more than raw capacity.",
    "A well tended garden rewards patience with tomatoes, basil, and "
    "the quiet satisfaction of a summer meal grown at home.",
    "The committee reviewed the proposal carefully and suggested minor "
    "revisions to the methodology before approving the budget.",
]
BAD = [
    "$$$ WIN NOW!!! CLICK CLICK CLICK 11111 22222 33333 !!!",
    ">>>> ~~~ ### @@@@ 9999999 BUY BUY BUY !!!! ****",
    "AAAAAAA BBBBBBB 123456789 !!!!!! ??????? %%%%%",
    "x",
]


def _train_df(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_fit_is_deterministic_and_separates(spark):
    df = _train_df(spark)
    w1, b1 = fit_quality_classifier(df, "label")
    w2, b2 = fit_quality_classifier(df, "label")
    assert w1 == w2 and b1 == b2
    assert len(w1) == len(QUALITY_FEATURES)
    scores = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", quality_model_score(F.col("text"), w1, b1).alias("s")
        ).collect()
    }
    good_scores = [scores[i] for i in range(len(GOOD))]
    bad_scores = [scores[100 + i] for i in range(len(BAD))]
    assert min(good_scores) > max(bad_scores)
    kept = quality_model_filter(
        df, w1, b1, min_score=(min(good_scores) + max(bad_scores)) / 2
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == list(range(len(GOOD)))


def test_expression_serving_matches_ml_transform(spark):
    """The codegen serving face must reproduce the ml pipeline's own
    probabilities — coefficients are the ONLY state that travels."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    df = _train_df(spark)
    feats = df.select(
        "doc_id",
        F.col("label").cast("double").alias("label"),
        *quality_feature_cols(F.col("text")),
    )
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="features"
    ).transform(feats)
    model = LogisticRegression(maxIter=50, regParam=0.01, standardization=True).fit(
        assembled
    )
    ml_probs = {
        r["doc_id"]: float(r["probability"][1])
        for r in model.transform(assembled).select("doc_id", "probability").collect()
    }
    w, b = [float(x) for x in model.coefficients], float(model.intercept)
    expr_probs = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", quality_model_score(F.col("text"), w, b).alias("s")
        ).collect()
    }
    for k in ml_probs:
        # 1e-6, not 1e-9: ml's margin sum and the expression's fixed
        # left-to-right sum associate differently, and a saturated
        # sigmoid amplifies that ulp-level difference under the shared
        # test session's varying parallelism
        assert expr_probs[k] == pytest.approx(ml_probs[k], abs=1e-6)


def test_null_text_scores_at_zero_features_not_error(spark):
    df = _train_df(spark)
    w, b = fit_quality_classifier(df, "label")
    nulls = spark.createDataFrame([(7, None, 0)], "doc_id long, text string, label int")
    s = nulls.select(quality_model_score(F.col("text"), w, b).alias("s")).first()["s"]
    assert s is not None and 0.0 <= s <= 1.0
    with pytest.raises(ValueError, match="weights"):
        quality_model_score(F.col("text"), [1.0], 0.0)
