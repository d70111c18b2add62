"""as_of_join tests: semantics against a brute-force reference, the
tolerance and direction knobs, and the plan shape (ONE key shuffle, no
cartesian/nested-loop pair blowup)."""

from __future__ import annotations

from datetime import datetime

import pytest

from etl_instagram_spark.operators.layout import exchange_count
from etl_instagram_spark.operators.temporal import as_of_join


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts(1), 100.0),
            ("A", _ts(5), 101.0),
            ("A", _ts(10), 102.0),
            ("B", _ts(3), 200.0),
            ("C", _ts(4), 300.0),  # no quotes at all for C
        ],
        "sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 99.5),
            ("A", _ts(5), 100.5),   # equal-ts: matches the _ts(5) trade
            ("A", _ts(7), 101.5),
            ("B", _ts(6), 201.0),   # only AFTER B's trade
        ],
        "sym string, ts timestamp, quote double",
    )
    return trades, quotes


def test_backward_semantics_vs_brute_force(spark, trades_quotes):
    trades, quotes = trades_quotes
    got = {
        (r["sym"], r["ts"]): (r["ts_r"], r["quote_r"])
        for r in as_of_join(trades, quotes, "sym").collect()
    }
    # brute force: latest quote with qts <= trade ts, per sym
    tl = [(r["sym"], r["ts"]) for r in trades.collect()]
    ql = [(r["sym"], r["ts"], r["quote"]) for r in quotes.collect()]
    for sym, ts in tl:
        cands = [(qts, q) for (s, qts, q) in ql if s == sym and qts <= ts]
        expect = max(cands) if cands else (None, None)
        assert got[(sym, ts)] == expect, (sym, ts)
    assert len(got) == trades.count()  # left-outer: every trade kept


def test_equal_timestamps_match(spark, trades_quotes):
    trades, quotes = trades_quotes
    row = {
        r["ts"]: r for r in as_of_join(trades, quotes, "sym").collect()
        if r["sym"] == "A"
    }
    assert row[_ts(5)]["quote_r"] == 100.5  # qts == ts matches, not the _ts(0) one


def test_tolerance_nulls_stale_matches(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        (r["sym"], r["ts"]): r["quote_r"]
        for r in as_of_join(trades, quotes, "sym", tolerance="2 minutes").collect()
    }
    assert out[("A", _ts(1))] == 99.5     # 1 min stale: kept
    assert out[("A", _ts(5))] == 100.5    # 0 min: kept
    assert out[("A", _ts(10))] is None    # nearest is 3 min stale: nulled
    assert out[("B", _ts(3))] is None
    assert out[("C", _ts(4))] is None


def test_tolerance_rejects_malformed_input(spark, trades_quotes):
    """tolerance is parsed against the '<n> <unit>' whitelist BEFORE any
    SQL is built — a malformed (or hostile) string raises ValueError at
    plan time instead of reaching F.expr."""
    import pytest

    trades, quotes = trades_quotes
    for bad in ("2 fortnights", "'; drop table x", "2minutes", "-1 hours", ""):
        with pytest.raises(ValueError, match="interval"):
            as_of_join(trades, quotes, "sym", tolerance=bad)


def test_forward_direction(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        (r["sym"], r["ts"]): (r["ts_r"], r["quote_r"])
        for r in as_of_join(trades, quotes, "sym", direction="forward").collect()
    }
    assert out[("A", _ts(1))] == (_ts(5), 100.5)   # earliest at-or-after
    assert out[("A", _ts(5))] == (_ts(5), 100.5)   # equality matches
    assert out[("A", _ts(10))] == (None, None)     # nothing after
    assert out[("B", _ts(3))] == (_ts(6), 201.0)   # B's quote is ahead
    with pytest.raises(ValueError, match="direction"):
        as_of_join(trades, quotes, "sym", direction="nearest")


def test_plan_one_exchange_no_cartesian(spark, trades_quotes):
    """The scale contract: union + window = ONE shuffle on the key and
    zero pair blowup — never the nested-loop/cartesian plan the naive
    non-equi range join degenerates to."""
    trades, quotes = trades_quotes
    df = as_of_join(trades, quotes, "sym")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert exchange_count(df) == 1


# ---------------------------------------------------------------------------
# gapfill
# ---------------------------------------------------------------------------


def _gap_df(spark):
    rows = [
        (1, "2024-01-01 00:10:00", "a", 10.0),
        (2, "2024-01-01 02:20:00", "a", 30.0),
        (3, "2024-01-01 05:30:00", "a", 60.0),
        (4, "2024-01-01 01:00:00", "b", 5.0),
    ]
    return (
        spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double"
        ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "event_type", "value")
    )


def test_gapfill_locf_and_linear(spark):
    from etl_instagram_spark.operators.temporal import gapfill

    out = {
        (r["event_type"], str(r["bucket_ts"])): (
            r["n_obs"], r["value_obs"], r["value_locf"], r["value_linear"]
        )
        for r in gapfill(_gap_df(spark), bucket="1 hour").collect()
    }
    assert out[("a", "2024-01-01 01:00:00")] == (0, None, 10.0, 20.0)
    assert out[("a", "2024-01-01 03:00:00")] == (0, None, 30.0, 40.0)
    assert out[("a", "2024-01-01 04:00:00")] == (0, None, 30.0, 50.0)
    assert out[("a", "2024-01-01 05:00:00")] == (1, 60.0, 60.0, 60.0)
    # key b spans a single bucket — no gaps emitted
    assert len([k for k in out if k[0] == "b"]) == 1


def test_gapfill_explicit_bounds_leading_and_trailing(spark):
    from etl_instagram_spark.operators.temporal import gapfill

    out = {
        (r["event_type"], str(r["bucket_ts"])): (r["value_locf"], r["value_linear"])
        for r in gapfill(
            _gap_df(spark).filter("event_type = 'b'"),
            bucket="1 hour",
            start="2024-01-01 00:00:00",
            end="2024-01-01 03:00:00",
        ).collect()
    }
    # leading gap: nothing to carry under either fill
    assert out[("b", "2024-01-01 00:00:00")] == (None, None)
    assert out[("b", "2024-01-01 01:00:00")] == (5.0, 5.0)
    # trailing gaps: LOCF under both (no next neighbor to interpolate to)
    assert out[("b", "2024-01-01 02:00:00")] == (5.0, 5.0)
    assert out[("b", "2024-01-01 03:00:00")] == (5.0, 5.0)


def test_gapfill_rejects_malformed_bucket(spark):
    from etl_instagram_spark.operators.temporal import gapfill

    with pytest.raises(ValueError):
        gapfill(_gap_df(spark), bucket="1; DROP TABLE x")


def test_rolling_zscore_flags_planted_spike(spark):
    from etl_instagram_spark.operators.temporal import rolling_zscore

    rows = [(i, f"2024-01-01 00:{i:02d}:00", "a", 10.0 + (i % 3) * 0.1) for i in range(30)]
    rows.append((30, "2024-01-01 00:30:00", "a", 500.0))  # the spike
    rows.append((31, "2024-01-01 00:31:00", "a", 10.1))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "event_type", "value")
    out = {r["event_id"]: (r["z_score"], r["is_anomaly"]) for r in rolling_zscore(df).collect()}
    assert out[30][1] is True and out[30][0] > 100
    assert all(not v[1] for k, v in out.items() if k != 30)
    # first two rows: window has <2 points -> NULL z, never flagged
    assert out[0] == (None, False) and out[1][1] is False


def test_rolling_zscore_zero_variance_window_never_flags(spark):
    from etl_instagram_spark.operators.temporal import rolling_zscore

    rows = [(i, f"2024-01-01 00:{i:02d}:00", "a", 7.0) for i in range(10)]
    rows.append((10, "2024-01-01 00:10:00", "a", 7.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "event_type", "value")
    out = rolling_zscore(df).collect()
    assert all(r["z_score"] is None and r["is_anomaly"] is False for r in out)


def test_gapfill_pre_1970_buckets_floor_not_truncate(spark):
    """Negative epochs: cast-truncation rounds toward zero, floor rounds
    down — a 1969 timestamp must land in ITS hour, not 1970's."""
    from etl_instagram_spark.operators.temporal import gapfill

    df = spark.createDataFrame(
        [(1, -1800, "a", 5.0), (2, 1800, "a", 7.0)],
        "event_id long, epoch long, event_type string, value double",
    ).selectExpr("event_id", "CAST(epoch AS TIMESTAMP) ts", "event_type", "value")
    out = sorted(
        (str(r["bucket_ts"]), r["n_obs"]) for r in gapfill(df, bucket="1 hour").collect()
    )
    assert out == [("1969-12-31 23:00:00", 1), ("1970-01-01 00:00:00", 1)]


def test_ewma_smooth_hand_and_differential(spark):
    """Hand case: head rows renormalize over present weights (row 1 ==
    its own value); a Python reference over a longer series agrees to
    the 6dp rounding; NULL values drop instead of misaligning."""
    from datetime import datetime, timedelta

    from etl_instagram_spark.operators.temporal import (
        ewma_smooth,
        ewma_weights,
    )

    t0 = datetime(2024, 1, 1)
    vals = [10.0, 20.0, None, 40.0, 5.0, 5.0, 80.0, 1.0, 2.0, 3.0]
    rows = [
        ("k", t0 + timedelta(seconds=i), i, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = {
        r["event_id"]: r["ewma"]
        for r in ewma_smooth(df, alpha=0.5, window=3).collect()
    }
    ws = ewma_weights(0.5, 3)
    series = [(i, v) for i, v in enumerate(vals) if v is not None]
    want = {}
    for pos, (i, _v) in enumerate(series):
        tail = series[max(0, pos - 2): pos + 1]  # last <=3 incl. self
        xs = [v for _j, v in tail][::-1]         # j=0 is the current row
        num = sum(x * ws[j] for j, x in enumerate(xs))
        den = sum(ws[j] for j in range(len(xs)))
        want[i] = round(num / den, 6)
    assert out == want
    assert out[0] == 10.0  # head renormalization: first row is itself
    assert 2 not in out    # the NULL row dropped

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ewma_weights(0.0, 3)
    with _pytest.raises(ValueError):
        ewma_weights(0.5, 0)
