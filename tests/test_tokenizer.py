"""Tests for the distributed BPE trainer (operators/tokenizer.py)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_instagram_spark.operators import tokenizer as T


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_frequencies_matches_python(spark):
    texts = ["low low lower", "LOW\tnewest\nnewest", None, "  ", "lower"]
    got = {
        r["word"]: r["freq"]
        for r in T.word_frequencies(_df(spark, texts)).collect()
    }
    assert got == {"low": 3, "lower": 2, "newest": 2}


def test_learn_bpe_hand_corpus():
    # the Sennrich toy corpus shape: 'low'x5 'lower'x2 'newest'x6 'widest'x3
    freqs = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = T.learn_bpe(freqs, n_merges=4)
    # 'es' appears 9x (newest+widest) — the clear first merge; then
    # 'es'+'t' (9), then 'est'+'</w>' (9), then 'l'+'o' (7)
    assert merges[:4] == [("e", "s"), ("es", "t"), ("est", T.EOW), ("l", "o")]


def test_learn_bpe_tie_breaks_on_smallest_pair():
    # 'ab' and 'cd' both appear exactly twice -> ('a','b') < ('c','d')
    merges = T.learn_bpe([("ab", 2), ("cd", 2)], n_merges=1)
    assert merges == [("a", "b")]


def test_learn_bpe_min_freq_stops():
    assert T.learn_bpe([("abc", 1)], n_merges=5, min_freq=2) == []


def test_bpe_apply_segments_concat_back():
    freqs = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = T.learn_bpe(freqs, n_merges=6)
    for w, _ in freqs:
        pieces = T.bpe_apply(w, merges)
        assert "".join(pieces) == w + T.EOW
        assert all(pieces)


def test_fit_and_count_end_to_end(spark):
    texts = ["low low low low low lower lower", "newest newest newest widest"]
    df = _df(spark, texts + [None, ""])
    merges = T.fit_bpe(df, n_merges=8, min_freq=2)
    got = df.select(
        "doc_id", T.bpe_token_count("text", merges).alias("nt")
    ).collect()
    by_id = {r["doc_id"]: r["nt"] for r in got}
    # python reference over the same pure functions
    for i, t in enumerate(texts):
        expect = sum(len(T.bpe_apply(w, merges)) for w in T.split_words(t))
        assert by_id[i] == expect
    assert by_id[2] == 0 and by_id[3] == 0  # NULL and empty text


def test_trainer_vocabulary_compresses_training_words(spark):
    """Words frequent enough to drive merges must segment into FEWER
    pieces than their character count — the point of the exercise."""
    df = _df(spark, ["sharing sharing sharing shared shared sharing"] * 3)
    merges = T.fit_bpe(df, n_merges=10, min_freq=2)
    assert len(T.bpe_apply("sharing", merges)) < len("sharing") + 1


@settings(
    deadline=None,
    max_examples=25,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    n_merges=st.integers(min_value=0, max_value=12),
)
def test_bpe_apply_total_and_lossless_property(words, n_merges):
    """For ANY learned merge list and ANY word (seen or unseen), the
    segmentation concatenates back to word+EOW and never emits an empty
    piece — encoding is total and lossless."""
    freqs = [(w, i + 1) for i, w in enumerate(sorted(set(words)))]
    merges = T.learn_bpe(freqs, n_merges, min_freq=1)
    for w in words + ["zzunseenzz"]:
        pieces = T.bpe_apply(w, merges)
        assert "".join(pieces) == w + T.EOW
        assert all(pieces)


def test_split_words_matches_spark_split(spark):
    """The Python-side splitter (used inside the Arrow encoder) must
    agree with the distributed F.split path on whitespace handling —
    including the vertical tab that Java \\s and RE2 \\s disagree on."""
    tricky = "A\tb\x0bC  d\r\ne\ff "
    df = spark.createDataFrame([(0, tricky)], "doc_id long, text string")
    spark_words = [
        r["word"] for r in T.word_frequencies(df, "text").orderBy("word").collect()
    ]
    assert sorted(set(T.split_words(tricky))) == spark_words
