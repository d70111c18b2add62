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


def test_expression_serving_matches_model_math(spark):
    """The codegen serving face must reproduce the fitted model's own
    sigmoid(w·x + b) over the same features — coefficients are the ONLY
    state that travels. The reference probabilities are computed in
    plain Python from the model's coefficients and the collected
    feature values (equivalent to ml transform's probability column,
    but without a second ml job: LogisticRegressionModel.transform's
    internal ScalaUDF closure intermittently fails Java serialization
    in a long-lived shared test session — a Spark quirk this test has
    no reason to be exposed to)."""
    import math

    df = _train_df(spark)
    w, b = fit_quality_classifier(df, "label")
    feat_rows = df.select("doc_id", *quality_feature_cols(F.col("text"))).collect()
    ref_probs = {
        r["doc_id"]: 1.0
        / (1.0 + math.exp(-(b + sum(wi * r[f] for wi, f in zip(w, QUALITY_FEATURES)))))
        for r in feat_rows
    }
    expr_probs = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", quality_model_score(F.col("text"), w, b).alias("s")
        ).collect()
    }
    for k in ref_probs:
        assert expr_probs[k] == pytest.approx(ref_probs[k], abs=1e-9)


def test_null_text_scores_at_zero_features_not_error(spark):
    df = _train_df(spark)
    w, b = fit_quality_classifier(df, "label")
    nulls = spark.createDataFrame([(7, None, 0)], "doc_id long, text string, label int")
    s = nulls.select(quality_model_score(F.col("text"), w, b).alias("s")).first()["s"]
    assert s is not None and 0.0 <= s <= 1.0
    with pytest.raises(ValueError, match="weights"):
        quality_model_score(F.col("text"), [1.0], 0.0)
