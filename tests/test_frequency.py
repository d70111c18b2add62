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
