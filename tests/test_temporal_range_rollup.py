"""range_join and hypertable_rollup tests: semantics against brute-force
references, the how/end_inclusive/keys knobs, plan shape (equi-join on
the bucket key — never a nested-loop pair blowup), and partials-reuse
consistency (coarse grains computed from finest partials equal a direct
aggregation of the raw rows)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.operators.temporal import (
    _interval_seconds,
    hypertable_rollup,
    range_join,
)


def _ts(day: int, hour: int = 0, minute: int = 0) -> datetime:
    return datetime(2024, 1, day, hour, minute)


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------


@pytest.fixture()
def points_intervals(spark):
    points = spark.createDataFrame(
        [
            (1, "u1", _ts(1, 12)),
            (2, "u1", _ts(3)),
            (3, "u2", _ts(3)),
            (4, "u1", _ts(9)),   # matches nothing
            (5, "u2", _ts(5)),   # exactly at an interval end (exclusive)
        ],
        "pid int, user string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, "u1", _ts(1), _ts(2)),       # contains pid 1 (same user)
            (11, "u1", _ts(2, 12), _ts(4)),   # contains pids 2, 3 (keyless)
            (12, "u2", _ts(4), _ts(5)),       # end-exclusive boundary for pid 5
            (13, "u2", _ts(1), _ts(8)),       # long interval spanning many buckets
        ],
        "iid int, user string, lo timestamp, hi timestamp",
    )
    return points, intervals


def _brute_pairs(points, intervals, end_inclusive=False, key=None):
    out = set()
    for p in points.collect():
        for i in intervals.collect():
            hit = i["lo"] <= p["ts"] <= i["hi"] if end_inclusive else i["lo"] <= p["ts"] < i["hi"]
            if hit and (key is None or p[key] == i[key]):
                out.add((p["pid"], i["iid"]))
    return out


def test_keyless_inner_matches_brute_force(spark, points_intervals):
    points, intervals = points_intervals
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "lo", "hi", bucket="1 days"
        ).collect()
    }
    assert got == _brute_pairs(points, intervals)


def test_bucket_width_does_not_change_semantics(spark, points_intervals):
    """Bucketization is an execution strategy: any width gives the same
    rows (intervals longer than the bucket explode to more rows; points
    near boundaries rely on the residual filter)."""
    points, intervals = points_intervals
    expect = _brute_pairs(points, intervals)
    for width in ("6 hours", "2 days", "1 weeks"):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "ts", "lo", "hi", bucket=width).collect()
        }
        assert got == expect, width


def test_end_inclusive_and_keys(spark, points_intervals):
    points, intervals = points_intervals
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "lo", "hi", on="user",
            bucket="1 days", end_inclusive=True,
        ).collect()
    }
    assert got == _brute_pairs(points, intervals, end_inclusive=True, key="user")
    assert (5, 12) in got  # boundary point admitted only when inclusive


def test_left_preserves_unmatched_points(spark, points_intervals):
    points, intervals = points_intervals
    rows = range_join(
        points, intervals, "ts", "lo", "hi", on="user", bucket="1 days", how="left"
    ).collect()
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["iid"])
    assert set(by_pid) == {1, 2, 3, 4, 5}
    assert by_pid[4] == [None]  # kept with null interval columns


def test_clashing_right_columns_are_suffixed(spark):
    left = spark.createDataFrame([(1, _ts(1))], "id int, ts timestamp")
    right = spark.createDataFrame(
        [(9, _ts(1), _ts(2))], "id int, lo timestamp, hi timestamp"
    )
    out = range_join(left, right, "ts", "lo", "hi", bucket="1 days")
    assert "id" in out.columns and "id_r" in out.columns
    row = out.collect()[0]
    assert (row["id"], row["id_r"]) == (1, 9)


def test_no_nested_loop_in_plan(spark, points_intervals):
    points, intervals = points_intervals
    plan = (
        range_join(points, intervals, "ts", "lo", "hi", bucket="1 days")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rejects_bad_args(spark, points_intervals):
    points, intervals = points_intervals
    with pytest.raises(ValueError, match="how"):
        range_join(points, intervals, "ts", "lo", "hi", how="right")
    with pytest.raises(ValueError, match="interval"):
        range_join(points, intervals, "ts", "lo", "hi", bucket="monthly")
    assert _interval_seconds("2 hours") == 7200


# ---------------------------------------------------------------------------
# hypertable_rollup
# ---------------------------------------------------------------------------


@pytest.fixture()
def metered(spark):
    rows = []
    base = datetime(2024, 1, 29, 10, 0)  # spans a month boundary mid-week
    for i in range(200):
        rows.append(
            (
                "a" if i % 3 else "b",
                base + timedelta(hours=i),
                float(i % 7),
                None if i % 11 == 0 else float(i),
            )
        )
    return spark.createDataFrame(rows, "kind string, ts timestamp, v double, w double")


def test_rollup_levels_match_direct_aggregation(spark, metered):
    """Each grain's rows must equal an independent single-grain groupBy
    over the RAW rows — partials-reuse is an optimization, not a
    semantics change (including null-aware avg on the gappy column)."""
    out = hypertable_rollup(
        metered,
        "ts",
        ["hour", "day", "month"],
        dims=["kind"],
        measures={"v": ["sum", "max"], "w": ["avg", "count"]},
    ).collect()
    for grain in ("hour", "day", "month"):
        got = {
            (r["bucket"], r["kind"]): (r["n_rows"], r["sum_v"], r["max_v"], r["avg_w"], r["count_w"])
            for r in out
            if r["grain"] == grain
        }
        direct = {
            (r["bucket"], r["kind"]): (r["n_rows"], r["sum_v"], r["max_v"], r["avg_w"], r["count_w"])
            for r in metered.groupBy(
                F.date_trunc(grain, "ts").alias("bucket"), "kind"
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("v").alias("sum_v"),
                F.max("v").alias("max_v"),
                F.avg("w").alias("avg_w"),
                F.count("w").alias("count_w"),
            )
            .collect()
        }
        assert set(got) == set(direct), grain
        for k in direct:
            g, d = got[k], direct[k]
            assert g[0] == d[0] and g[2] == d[2] and g[4] == d[4], (grain, k)
            assert g[1] == pytest.approx(d[1]) and g[3] == pytest.approx(d[3]), (grain, k)


def test_rollup_single_raw_shuffle(spark, metered):
    """The raw table must be aggregated once: exactly ONE partial_count
    over the raw-row count expression; coarser grains re-aggregate the
    finest partials (their inputs are the __-prefixed partial columns)."""
    plan = (
        hypertable_rollup(metered, "ts", ["hour", "day"], dims=["kind"], measures={"v": ["sum"]})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the raw scan feeds exactly one aggregation chain; re-aggs consume
    # partial columns, visible as sum(__rc) merges rather than count(1)
    assert plan.count("count(1)") <= 2  # partial + final of the single base agg
    assert "sum(__rc" in plan


def test_rollup_validates_grains(spark, metered):
    with pytest.raises(ValueError, match="finest"):
        hypertable_rollup(metered, "ts", ["week", "month"])
    with pytest.raises(ValueError, match="finest → coarser"):
        hypertable_rollup(metered, "ts", ["day", "hour"])
    with pytest.raises(ValueError, match="unknown grain"):
        hypertable_rollup(metered, "ts", ["fortnight"])
    with pytest.raises(ValueError, match="unsupported aggs"):
        hypertable_rollup(metered, "ts", ["day"], measures={"v": ["median"]})
    with pytest.raises(ValueError, match="non-empty"):
        hypertable_rollup(metered, "ts", [])


def test_rollup_week_and_month_both_derive_from_day(spark, metered):
    """week and month don't nest in each other; both must come from the
    day partials — a row in the Jan-29 week (which crosses into Feb)
    lands in the January month bucket iff its DAY is in January."""
    out = hypertable_rollup(
        metered, "ts", ["day", "week", "month"], measures={"v": ["sum"]}
    ).collect()
    jan = [r for r in out if r["grain"] == "month" and r["bucket"].month == 1]
    feb = [r for r in out if r["grain"] == "month" and r["bucket"].month == 2]
    assert len(jan) == 1 and len(feb) == 1
    # raw check: January has 3 days * 24 rows minus the 10:00 start offset
    n_jan = metered.filter(F.month("ts") == 1).count()
    assert jan[0]["n_rows"] == n_jan
    assert feb[0]["n_rows"] == 200 - n_jan


def test_rollup_distinct_counts_via_mergeable_sketches(spark, metered):
    """Distinct counts don't sum across buckets, so they ride as HLL
    sketches. Two invariants: (1) the week/month estimate equals the
    estimate of a sketch built DIRECTLY at that grain (union of
    same-lg_k sketches is lossless — merge introduces no extra error);
    (2) at this tiny cardinality the estimate equals the exact distinct
    count."""
    out = hypertable_rollup(
        metered, "ts", ["hour", "day", "month"], distinct_counts=["kind"]
    ).collect()
    got = {
        (r["grain"], r["bucket"]): r["approx_distinct_kind"] for r in out
    }
    for grain in ("hour", "day", "month"):
        direct = {
            r["bucket"]: (r["est"], r["exact"])
            for r in metered.groupBy(F.date_trunc(grain, "ts").alias("bucket"))
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("kind", F.lit(12))
                ).alias("est"),
                F.countDistinct("kind").alias("exact"),
            )
            .collect()
        }
        for bucket, (est, exact) in direct.items():
            assert got[(grain, bucket)] == est, (grain, bucket)
            assert got[(grain, bucket)] == exact, (grain, bucket)


def test_rollup_distinct_user_cardinality(spark):
    """Realistic shape: distinct high-cardinality ids per hour vs per
    day — the day estimate must be within HLL error (~2% at lg_k=12) of
    the exact count, and strictly larger than any single hour's."""
    from datetime import datetime, timedelta

    base = datetime(2024, 3, 1)
    rows = [
        (base + timedelta(hours=h, seconds=i), f"u{(h * 7919 + i * 104729) % 5000}")
        for h in range(24)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user string")
    out = hypertable_rollup(
        df, "ts", ["hour", "day"], distinct_counts=["user"], row_count=None
    ).collect()
    day = [r for r in out if r["grain"] == "day"][0]
    exact = df.select("user").distinct().count()
    assert day["approx_distinct_user"] == pytest.approx(exact, rel=0.03)
    hours = [r["approx_distinct_user"] for r in out if r["grain"] == "hour"]
    assert len(hours) == 24 and max(hours) < day["approx_distinct_user"]


def test_range_join_clashing_interval_columns(spark):
    """start/end names existing on BOTH sides (e.g. joining two interval
    tables on their bounds) must resolve through the suffix rename."""
    left = spark.createDataFrame(
        [(1, _ts(1, 12), _ts(1))], "pid int, ts timestamp, lo timestamp"
    )
    right = spark.createDataFrame(
        [(9, _ts(1), _ts(2))], "iid int, lo timestamp, hi timestamp"
    )
    rows = range_join(left, right, "ts", "lo", "hi", bucket="1 days").collect()
    assert [(r["pid"], r["iid"]) for r in rows] == [(1, 9)]


def test_range_join_inverted_intervals_cost_nothing(spark, points_intervals):
    """A corrupt interval with end < start matches nothing AND must not
    explode into a years-long descending bucket sequence."""
    points, intervals = points_intervals
    corrupt = intervals.union(
        intervals.limit(1).select(
            F.lit(99).alias("iid"), F.lit("u1").alias("user"),
            F.lit(_ts(9)).alias("lo"), F.lit(_ts(1)).alias("hi"),
        )
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, corrupt, "ts", "lo", "hi", bucket="1 days").collect()
    }
    assert got == _brute_pairs(points, intervals)  # corrupt row invisible


def test_rollup_empty_agg_raises_clear_error(spark, metered):
    with pytest.raises(ValueError, match="nothing to aggregate"):
        hypertable_rollup(metered, "ts", ["hour"], row_count=None)


def test_rollup_dunder_dim_not_misclassified(spark, metered):
    """A dim column named with a '__' prefix must come through as a dim,
    not be swallowed into the partial-merge set."""
    df = metered.withColumn("__site", F.lit("a"))
    out = hypertable_rollup(df, "ts", ["hour"], dims=["__site"], row_count="n")
    assert "__site" in out.columns
    assert out.filter(F.col("__site") == "a").count() == out.count()
    assert out.count() > 0
