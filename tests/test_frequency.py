"""Exact heavy hitters (operators/frequency.py): differential vs the
full group-by, bounded-summary invariant, partitioning invariance."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_instagram_spark.operators.frequency import heavy_hitters, mg_summary
from tests.conftest import rows_set


def exact_hh(terms: list[str | None], num: int, den: int) -> set[tuple[str, int]]:
    """Reference: plain counting + integer threshold."""
    counts = Counter(t for t in terms if t is not None)
    n = sum(counts.values())
    return {(t, c) for t, c in counts.items() if c * den >= n * num}


def terms_df(spark, terms, parts):
    return spark.createDataFrame(
        [(t,) for t in terms], "term string"
    ).repartition(parts)


def test_matches_exact_on_skewed_corpus(spark):
    rng = random.Random(42)
    # zipf-ish: few hot terms + a long unique tail
    terms = (
        ["the"] * 400
        + ["of"] * 150
        + ["and"] * 90
        + ["rare"] * 9
        + [f"tail{i}" for i in range(600)]
    )
    rng.shuffle(terms)
    want = exact_hh(terms, 1, 20)  # support 5%
    assert {t for t, _ in want} == {"the", "of", "and"}
    for parts in (1, 3, 16):
        got = rows_set(heavy_hitters(terms_df(spark, terms, parts), "term", 1, 20))
        assert set(got) == want, parts


def test_summary_is_bounded(spark):
    terms = [f"t{i % 97}" for i in range(5000)]
    parts = 8
    capacity = 10
    summary = mg_summary(terms_df(spark, terms, parts), "term", capacity)
    rows = summary.collect()
    # ≤ capacity candidates + 1 total row per partition, regardless of
    # the 97-term domain
    assert len(rows) <= parts * (capacity + 1)
    assert sum(r["n_part"] or 0 for r in rows) == 5000


def test_nulls_ignored_and_empty_input(spark):
    terms = ["a", None, "a", "b", None]
    got = rows_set(heavy_hitters(terms_df(spark, terms, 2), "term", 1, 2))
    # n=3 non-null; a:2 (2*2>=3*1 ✓), b:1 (1*2<3 ✗)
    assert got == [("a", 2)]
    empty = terms_df(spark, [], 1).filter(F.lit(False))
    assert heavy_hitters(empty, "term", 1, 10).count() == 0


def test_bad_support_raises(spark):
    df = terms_df(spark, ["x"], 1)
    with pytest.raises(ValueError):
        heavy_hitters(df, "term", 0, 5)
    with pytest.raises(ValueError):
        heavy_hitters(df, "term", 3, 2)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    terms=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]), max_size=120
    ),
    num_den=st.sampled_from([(1, 10), (1, 4), (1, 2), (2, 3)]),
    parts=st.sampled_from([1, 2, 5]),
)
def test_property_matches_exact(spark, terms, num_den, parts):
    num, den = num_den
    got = rows_set(heavy_hitters(terms_df(spark, terms, parts), "term", num, den))
    assert set(got) == exact_hh(terms, num, den)


# ---------------------------------------------------------------------------
# incremental / streaming heavy hitters (streaming/incremental.py)
# ---------------------------------------------------------------------------

from etl_instagram_spark.operators.merge import MergeTable
from etl_instagram_spark.streaming.incremental import (
    HH_TOTAL_KEY,
    apply_hh_delta,
    compact_hh_summaries,
    heavy_hitters_read,
    stream_heavy_hitters,
)


def hh_store(spark, tmp_path):
    return MergeTable(
        spark,
        str(tmp_path / "hh_store"),
        key=["epoch_id", "term_key"],
        order_by="epoch_id",
    )


BATCHES = [
    ["the"] * 40 + ["of"] * 15 + [f"a{i}" for i in range(30)],
    ["the"] * 30 + ["and"] * 25 + [f"b{i}" for i in range(40)],
    ["of"] * 20 + ["the"] * 10 + [f"c{i}" for i in range(20)],
]


def test_incremental_hh_bounds_and_completeness(spark, tmp_path):
    store = hh_store(spark, tmp_path)
    for epoch, batch in enumerate(BATCHES):
        apply_hh_delta(store, terms_df(spark, batch, 3), epoch)

    allterms = [t for b in BATCHES for t in b]
    counts = Counter(allterms)
    n = len(allterms)
    capacity = 25  # support 1/10 needs capacity+1 > 10; use extra room
    out = {
        r["term"]: (r["weight_lo"], r["weight_hi"])
        for r in heavy_hitters_read(store, capacity, 1, 10).collect()
    }
    # completeness: every true >=10% term is reported
    for t, c in counts.items():
        if c * 10 >= n:
            assert t in out, (t, c, n)
    # honest bounds on everything reported
    for t, (lo, hi) in out.items():
        assert lo <= counts[t] <= hi, (t, lo, counts[t], hi)
        assert hi - lo == n // (capacity + 1)


def test_incremental_hh_replay_idempotent(spark, tmp_path):
    store = hh_store(spark, tmp_path)
    apply_hh_delta(store, terms_df(spark, BATCHES[0], 2), 0)
    before = rows_set(heavy_hitters_read(store, 25, 1, 10))
    # foreachBatch re-fires epoch 0 after a crash
    apply_hh_delta(store, terms_df(spark, BATCHES[0], 4), 0)
    assert rows_set(heavy_hitters_read(store, 25, 1, 10)) == before
    # store did not grow: same (epoch, term_key) rows upserted over selves
    assert store.read().count() == len(set(BATCHES[0])) + 1


def test_incremental_hh_compaction_preserves_report(spark, tmp_path):
    store = hh_store(spark, tmp_path)
    for epoch, batch in enumerate(BATCHES):
        apply_hh_delta(store, terms_df(spark, batch, 2), epoch)
    capacity = 25
    before = heavy_hitters_read(store, capacity, 1, 10)
    before_terms = {r["term"] for r in before.collect()}

    with pytest.raises(ValueError, match="through_epoch"):
        compact_hh_summaries(store, 2, capacity)  # == newest: refused

    eliminated = compact_hh_summaries(store, 1, capacity)
    assert eliminated > 0
    after = heavy_hitters_read(store, capacity, 1, 10)
    after_terms = {r["term"] for r in after.collect()}
    # completeness survives compaction (bounds may widen only within the
    # mergeability guarantee, so true HH can never drop out)
    allterms = [t for b in BATCHES for t in b]
    counts, n = Counter(allterms), len(allterms)
    for t, c in counts.items():
        if c * 10 >= n:
            assert t in after_terms, t
    for r in after.collect():
        assert r["weight_lo"] <= counts[r["term"]] <= r["weight_hi"], r
    # compaction is re-runnable at a higher watermark only; history shrank
    assert store.read().filter(F.col("epoch_id") <= 1).count() <= capacity + 1
    assert before_terms <= after_terms | before_terms  # sanity


def test_heavy_hitters_read_rejects_undersized_capacity(spark, tmp_path):
    store = hh_store(spark, tmp_path)
    apply_hh_delta(store, terms_df(spark, ["x", "y"], 1), 0)
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters_read(store, 9, 1, 10)


def test_stream_heavy_hitters_tick(spark, tmp_path):
    """End-to-end AvailableNow drain: landed JSON term rows → epoch
    summaries → report."""
    import json

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "b0.json").write_text(
        "\n".join(json.dumps({"term": t}) for t in BATCHES[0])
    )
    store = hh_store(spark, tmp_path)
    stream_heavy_hitters(
        spark,
        str(landing),
        "term string",
        store,
        str(tmp_path / "ckpt"),
    )
    got = {r["term"] for r in heavy_hitters_read(store, 25, 1, 10).collect()}
    assert "the" in got and "of" in got
    stored = store.read()
    assert stored.filter(F.col("term_key") == HH_TOTAL_KEY).count() >= 1


WEIGHTED_BATCHES = [
    [("big", 30), ("big", 10), ("mid", 20), ("s1", 5), ("s2", 2)],
    [("big", 25), ("and", 30), ("s3", 9), ("mid", 4)],
    [("of", 18), ("big", 6), ("s1", 3)],
]


def wdf(spark, batch, parts):
    return spark.createDataFrame(batch, "term string, wt long").repartition(
        parts
    )


def test_incremental_hh_weighted_matches_unit_explosion(spark, tmp_path):
    """WEIGHTED continuous heavy hitters (r13 VERDICT missing #1):
    the weighted epoch store is BIT-IDENTICAL to feeding the unit-row
    explosion through the unweighted face (a weight-w row is w unit
    rows to exact counting — the batch-face pinning convention), the
    merged read answers "which terms hold >= num/den of the total
    WEIGHT" with completeness + honest bounds against weighted truth,
    a crashed-tick replay is a no-op, compaction preserves the report,
    and bad weights raise loudly inside the scan."""
    wstore = MergeTable(
        spark,
        str(tmp_path / "whh"),
        key=["epoch_id", "term_key"],
        order_by="epoch_id",
    )
    ustore = MergeTable(
        spark,
        str(tmp_path / "uhh"),
        key=["epoch_id", "term_key"],
        order_by="epoch_id",
    )
    for epoch, batch in enumerate(WEIGHTED_BATCHES):
        apply_hh_delta(wstore, wdf(spark, batch, 3), epoch, weight_col="wt")
        exploded = [t for t, w in batch for _ in range(w)]
        apply_hh_delta(ustore, terms_df(spark, exploded, 4), epoch)
    assert sorted(map(tuple, wstore.read().collect())) == sorted(
        map(tuple, ustore.read().collect())
    )

    counts = Counter()
    for batch in WEIGHTED_BATCHES:
        for t, w in batch:
            counts[t] += w
    n = sum(counts.values())
    capacity = 25
    out = {
        r["term"]: (r["weight_lo"], r["weight_hi"])
        for r in heavy_hitters_read(wstore, capacity, 1, 10).collect()
    }
    assert out == {
        r["term"]: (r["weight_lo"], r["weight_hi"])
        for r in heavy_hitters_read(ustore, capacity, 1, 10).collect()
    }
    for t, c in counts.items():  # completeness vs WEIGHT shares
        if c * 10 >= n:
            assert t in out, (t, c, n)
    assert "big" in out and "s2" not in out
    for t, (lo, hi) in out.items():  # honest bounds
        assert lo <= counts[t] <= hi, (t, lo, counts[t], hi)

    # crashed-tick replay: same epoch, different partitioning — no-op
    before = sorted(map(tuple, wstore.read().collect()))
    apply_hh_delta(
        wstore, wdf(spark, WEIGHTED_BATCHES[0], 7), 0, weight_col="wt"
    )
    assert sorted(map(tuple, wstore.read().collect())) == before

    # compaction preserves weighted completeness
    eliminated = compact_hh_summaries(wstore, 1, capacity)
    assert eliminated >= 0
    after = {
        r["term"] for r in heavy_hitters_read(wstore, capacity, 1, 10).collect()
    }
    for t, c in counts.items():
        if c * 10 >= n:
            assert t in after, t

    # bad weights raise loudly
    bad = spark.createDataFrame([("x", 0)], "term string, wt long")
    with pytest.raises(Exception, match="positive int64"):
        apply_hh_delta(wstore, bad, 99, weight_col="wt")

    # the read face shares the batch face's int64 threshold bound: a
    # token-mass store past W*max(num,den) < 2^63 must raise, not wrap
    big = MergeTable(
        spark,
        str(tmp_path / "bighh"),
        key=["epoch_id", "term_key"],
        order_by="epoch_id",
    )
    apply_hh_delta(
        big,
        spark.createDataFrame([("x", 2**62)], "term string, wt long"),
        0,
        weight_col="wt",
    )
    with pytest.raises(ValueError, match="overflows"):
        heavy_hitters_read(big, capacity, 1, 4)


def test_stream_heavy_hitters_weighted_tick(spark, tmp_path):
    """End-to-end weighted AvailableNow drain: landed (term, wt) rows →
    weighted epoch summary → the total row carries the token MASS and
    the read reports weight-share hitters."""
    import json

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "b0.json").write_text(
        "\n".join(
            json.dumps({"term": t, "wt": w}) for t, w in WEIGHTED_BATCHES[0]
        )
    )
    store = hh_store(spark, tmp_path)
    stream_heavy_hitters(
        spark,
        str(landing),
        "term string, wt long",
        store,
        str(tmp_path / "ckpt"),
        weight_col="wt",
    )
    mass = sum(w for _, w in WEIGHTED_BATCHES[0])
    total = (
        store.read()
        .filter(F.col("term_key") == HH_TOTAL_KEY)
        .agg(F.sum("n_part"))
        .collect()[0][0]
    )
    assert total == mass
    got = {r["term"] for r in heavy_hitters_read(store, 25, 1, 10).collect()}
    assert "big" in got and "s2" not in got


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
            max_size=60,
        ),
        min_size=1,
        max_size=4,
    ),
    capacity=st.sampled_from([2, 3, 5]),
)
def test_mg_merge_error_bound_property(spark, batches, capacity):
    """The mergeability claim itself, pinned: merging per-batch MG
    summaries (any split, any order) keeps every term's weight within
    [true_count − n/(capacity+1), true_count], and absent terms have
    true_count ≤ n/(capacity+1)."""
    from etl_instagram_spark.operators.frequency import mg_merge, mg_summary

    summaries = None
    for batch in batches:
        s = mg_summary(terms_df(spark, batch, 2), "term", capacity)
        summaries = s if summaries is None else summaries.unionByName(s)
    merged = mg_merge(summaries, capacity).collect()

    counts = Counter(t for b in batches for t in b)
    n = sum(counts.values())
    weights = {r["term"]: r["weight"] for r in merged if r["term"] is not None}
    n_row = sum(r["n_part"] or 0 for r in merged if r["term"] is None)
    assert n_row == n
    assert len(weights) <= capacity
    slack = n / (capacity + 1)
    for t, c in counts.items():
        w = weights.get(t, 0)
        assert w <= c, (t, w, c)
        assert w >= c - slack - 1e-9, (t, w, c, slack)


def test_stream_heavy_hitters_second_drain_new_epoch(spark, tmp_path):
    """The production contract the bench tick relies on: landing more
    files into the SAME landing/checkpoint lineage and draining again
    folds a NEW epoch into the store (AvailableNow processes only the
    new files), and the merged read covers both drains' terms."""
    import json

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "b0.json").write_text(
        "\n".join(json.dumps({"term": t}) for t in BATCHES[0])
    )
    store = hh_store(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    stream_heavy_hitters(spark, str(landing), "term string", store, ckpt)
    n_after_first = (
        store.read().filter(F.col("term_key") == HH_TOTAL_KEY)
        .agg(F.sum("n_part")).collect()[0][0]
    )
    assert n_after_first == len(BATCHES[0])

    (landing / "b1.json").write_text(
        "\n".join(json.dumps({"term": t}) for t in BATCHES[1])
    )
    stream_heavy_hitters(spark, str(landing), "term string", store, ckpt)
    stored = store.read()
    epochs = sorted(
        r["epoch_id"] for r in stored.select("epoch_id").distinct().collect()
    )
    assert len(epochs) == 2, epochs  # second drain = its own epoch
    total = (
        stored.filter(F.col("term_key") == HH_TOTAL_KEY)
        .agg(F.sum("n_part")).collect()[0][0]
    )
    assert total == len(BATCHES[0]) + len(BATCHES[1])
    got = {r["term"] for r in heavy_hitters_read(store, 25, 1, 10).collect()}
    # 'and' is heavy only in batch 1; 'the' in both — both must surface
    assert {"the", "and"} <= got


def test_weighted_heavy_hitters_exact_and_matches_duckdb(spark):
    """Weighted heavy hitters ("which domains hold >= num/den of all
    tokens"): exact equality with (a) the unit-row-exploded unweighted
    run (the averaging argument is weight-agnostic), (b) a DuckDB
    GROUP BY HAVING sum(w)*den >= W*num oracle, under adversarial
    partitioning; bad weights raise loudly."""
    import duckdb
    import pytest as _pytest

    from etl_instagram_spark.operators.frequency import heavy_hitters

    # domain 'big' holds 60 of 101 tokens across few rows; 'mid' 25;
    # the rest are small
    rows = [("big", 30), ("big", 30), ("mid", 25), ("s1", 7), ("s2", 9)]
    df = spark.createDataFrame(rows, "term string, wt long")
    got = sorted(
        map(
            tuple,
            heavy_hitters(
                df.repartition(7), "term", 1, 5, weight_col="wt"
            ).collect(),
        )
    )
    exploded = df.withColumn(
        "__i", F.explode(F.sequence(F.lit(1), F.col("wt")))
    ).select("term")
    unit = sorted(
        map(tuple, heavy_hitters(exploded, "term", 1, 5).collect())
    )
    assert got == unit
    values = ",".join(f"('{t}',{w})" for t, w in rows)
    oracle = sorted(
        duckdb.sql(
            f"SELECT term, (sum(wt))::BIGINT AS n_occ"
            f" FROM (VALUES {values}) t(term, wt)"
            f" GROUP BY term"
            f" HAVING sum(wt) * 5 >= (SELECT sum(wt) FROM (VALUES {values}) s(term, wt)) * 1"
        ).fetchall()
    )
    assert got == oracle
    assert {t for t, _ in got} == {"big", "mid"}

    bad = spark.createDataFrame([("x", 0)], "term string, wt long")
    with _pytest.raises(Exception, match="positive int64"):
        heavy_hitters(bad, "term", 1, 5, weight_col="wt").collect()


def test_weighted_heavy_hitters_overflow_guard(spark):
    """The integer threshold multiplies totals bounded by W by the
    support rational in int64; W*max(num, den) >= 2^63 must raise
    loudly (r13 ADVICE #3) instead of silently wrapping in non-ANSI
    Spark where DuckDB would error — mirroring pps_sample's W*n bound.
    A safe W at the same support passes."""
    import pytest as _pytest

    from etl_instagram_spark.operators.frequency import heavy_hitters

    huge = spark.createDataFrame([("x", 2**62)], "term string, wt long")
    with _pytest.raises(ValueError, match="overflows"):
        heavy_hitters(huge, "term", 1, 4, weight_col="wt")
    safe = spark.createDataFrame([("x", 2**60)], "term string, wt long")
    got = heavy_hitters(safe, "term", 1, 4, weight_col="wt").collect()
    assert [(r["term"], r["n_occ"]) for r in got] == [("x", 2**60)]
