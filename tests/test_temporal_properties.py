"""Property-based tests (hypothesis) for the temporal join operators:
as_of_join and range_join vs brute-force Python references over
generated timelines — key overlap, equal timestamps, empty sides, and
intervals of every shape (instant, inverted, bucket-spanning) arise
from the generators rather than hand-picked fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_instagram_spark.operators.temporal import as_of_join, range_join

BASE = datetime(2024, 1, 1)


def _dt(steps: int) -> datetime:
    return BASE + timedelta(hours=steps)


# small key space and time range force key collisions and ts ties
left_row = st.tuples(st.integers(0, 2), st.integers(0, 20))      # (key, ts)
right_row = st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 99))
interval_row = st.tuples(st.integers(0, 200), st.integers(-5, 40), st.integers(-6, 48))
# (unused, lo, len) — len 0 = instant (empty under end-exclusive),
# len < 0 = inverted (matches nothing, must also cost nothing)


@settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(left_row, min_size=1, max_size=8),
    rights=st.lists(right_row, max_size=8),
)
def test_asof_backward_matches_brute_force(spark, lefts, rights):
    # unique-ify right per (key, ts) — documented tie contract
    rmap = {}
    for k, ts, v in rights:
        rmap[(k, ts)] = max(rmap.get((k, ts), -1), v)
    rrows = [(k, _dt(ts), v) for (k, ts), v in rmap.items()]
    lrows = [(i, k, _dt(ts)) for i, (k, ts) in enumerate(lefts)]
    ldf = spark.createDataFrame(lrows, "lid int, key int, ts timestamp")
    rdf = spark.createDataFrame(
        rrows or [(None, None, None)], "key int, ts timestamp, quote int"
    ).filter("key is not null")
    got = {
        r["lid"]: (r["ts_r"], r["quote_r"])
        for r in as_of_join(ldf, rdf, "key").collect()
    }
    for lid, k, lts in lrows:
        cands = [(rts, v) for (rk, rts, v) in rrows if rk == k and rts <= lts]
        expect = max(cands) if cands else (None, None)
        assert got[lid] == expect, (lid, k, lts)
    assert len(got) == len(lrows)  # left-outer totality


@settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.integers(0, 60), min_size=1, max_size=8),
    intervals=st.lists(interval_row, max_size=6),
    bucket_hours=st.sampled_from([1, 7, 24]),
)
def test_range_join_matches_brute_force(spark, points, intervals, bucket_hours):
    prows = [(i, _dt(p)) for i, p in enumerate(points)]
    irows = [
        (1000 + j, _dt(lo), _dt(lo + ln)) for j, (_, lo, ln) in enumerate(intervals)
    ]
    pdf = spark.createDataFrame(prows, "pid int, ts timestamp")
    idf = spark.createDataFrame(
        irows or [(None, None, None)], "iid int, lo timestamp, hi timestamp"
    ).filter("iid is not null")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            pdf, idf, "ts", "lo", "hi", bucket=f"{bucket_hours} hours"
        ).collect()
    }
    expect = {
        (pid, iid)
        for pid, ts in prows
        for iid, lo, hi in irows
        if lo <= ts < hi
    }
    assert got == expect


@settings(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    obs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.floats(-100, 100)),
        min_size=1,
        max_size=15,
    )
)
def test_gapfill_matches_python_reference(spark, obs):
    """For ANY set of (hour, value) observations on one key, gapfill's
    grid, LOCF, and linear fills must match a pure-Python replay."""
    from etl_instagram_spark.operators.temporal import gapfill

    base = 1704067200  # 2024-01-01 00:00:00 UTC, hour-aligned
    rows = [
        (i, base + h * 3600, "k", float(v)) for i, (h, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, epoch long, event_type string, value double"
    ).selectExpr("event_id", "CAST(epoch AS TIMESTAMP) ts", "event_type", "value")
    got = {
        int(r["bucket_ts"].timestamp()): (
            r["n_obs"], r["value_obs"], r["value_locf"], r["value_linear"]
        )
        for r in gapfill(df, bucket="1 hour").collect()
    }
    # python reference
    from collections import defaultdict

    per_bucket = defaultdict(list)
    for _, (h, v) in zip(rows, obs):
        per_bucket[base + h * 3600].append(float(v))
    lo, hi = min(per_bucket), max(per_bucket)
    assert set(got) == {b for b in range(lo, hi + 3600, 3600)}
    prev = None
    obs_sorted = sorted(per_bucket.items())
    for b in range(lo, hi + 3600, 3600):
        n = len(per_bucket.get(b, []))
        mean = round(sum(per_bucket[b]) / n, 6) if n else None
        if n:
            prev = (b, mean)
        nxt = next(((bb, round(sum(vs) / len(vs), 6)) for bb, vs in obs_sorted if bb >= b), None)
        want_locf = prev[1] if prev else None
        if mean is not None:
            want_lin = mean
        elif prev and nxt:
            frac = (b - prev[0]) / (nxt[0] - prev[0])
            want_lin = round(prev[1] + (nxt[1] - prev[1]) * frac, 6)
        else:
            want_lin = want_locf
        g = got[b]
        assert g[0] == n
        assert g[1] == mean or (g[1] is not None and mean is not None and abs(g[1] - mean) < 1e-9)
        assert g[2] == want_locf or (g[2] is not None and want_locf is not None and abs(g[2] - want_locf) < 1e-9)
        # 5e-6, not 1e-9: the reference uses Python round (half-even),
        # Spark rounds half-up — a value landing exactly on .5 at the
        # 6th decimal differs by one ulp-of-rounding between them
        assert (g[3] is None and want_lin is None) or abs(g[3] - want_lin) < 5e-6
