"""Tests for the one-pass column profiler (operators/profiling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_instagram_spark.operators.profiling import profile_columns, profile_drift


def _df(spark):
    rows = [
        (1, 10.0, "a"),
        (2, None, "b"),
        (3, 30.0, None),
        (4, 30.0, "a"),
    ]
    return spark.createDataFrame(rows, "k long, v double, s string")


def test_profile_counts_and_numeric_stats(spark):
    p = {r["column"]: r for r in profile_columns(_df(spark), exact_distinct=True).collect()}
    assert set(p) == {"k", "v", "s"}
    assert all(r["n_rows"] == 4 for r in p.values())
    assert p["v"]["n_nulls"] == 1 and p["s"]["n_nulls"] == 1 and p["k"]["n_nulls"] == 0
    assert p["v"]["n_distinct"] == 2 and p["s"]["n_distinct"] == 2
    assert p["v"]["min_d"] == 10.0 and p["v"]["max_d"] == 30.0
    assert p["v"]["avg_d"] == round((10.0 + 30.0 + 30.0) / 3, 4)
    # non-numeric columns carry NULL numeric stats but real counts
    assert p["s"]["min_d"] is None and p["s"]["avg_d"] is None


def test_profile_single_scan_plan(spark):
    """The profile must be ONE aggregate over ONE scan of the input —
    not one job per column."""
    plan = (
        profile_columns(_df(spark), exact_distinct=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") == 1, plan


def test_profile_drift_flags_null_storm_and_dropped_column(spark):
    before = profile_columns(_df(spark), exact_distinct=True)
    after_df = _df(spark).withColumn(
        "v", F.when(F.col("k") <= 2, F.col("v"))
    ).drop("s")
    after = profile_columns(after_df, exact_distinct=True)
    d = {r["column"]: r for r in profile_drift(before, after).collect()}
    # v: nulls went 1/4 -> 3/4
    assert d["v"]["null_frac_delta"] == 0.5
    assert d["s"]["column_added_or_dropped"] is True
    assert d["k"]["column_added_or_dropped"] is False
    assert d["k"]["distinct_ratio"] == 1.0


def test_profile_approx_close_to_exact(spark):
    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("m")
    )
    approx = {r["column"]: r["n_distinct"] for r in profile_columns(df).collect()}
    assert abs(approx["m"] - 97) / 97 < 0.15
    assert abs(approx["k"] - 5000) / 5000 < 0.15
