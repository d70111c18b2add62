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
