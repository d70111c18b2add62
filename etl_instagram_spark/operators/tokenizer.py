"""Distributed BPE tokenizer training and application.

Engine extension for training-data pipelines (SURVEY §2 LLM-ops family;
the reference has no tokenizer surface — its only token-adjacent code is
word splitting for LDA, lda/index.js:20-31). This implements the
Sennrich-style byte-pair-encoding trainer (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016)
in the shape real BPE trainers use at corpus scale:

- **The corpus pass is distributed and happens ONCE**: split → explode →
  count words (one map-side-combinable shuffle producing O(vocab) rows).
  At 100 TB this is the only stage that touches every byte.
- **The merge loop runs on the driver over the BOUNDED word-frequency
  table** (``max_words`` most frequent, deterministic order). This is
  not a shortcut — it is how subword trainers actually work (they train
  on word counts, never on the raw corpus), and the frequency table for
  a capped vocabulary is KBs. A "distributed" merge loop would pay
  n_merges full shuffles to iterate over kilobytes.
- **Application is Arrow-batched** with per-word memoization: encoding
  cost scales with DISTINCT words per batch, not tokens.

Determinism contract (what makes the oracle gate possible): the
frequency collection sorts (freq DESC, word ASC) before the cap, and
the merge loop breaks count ties on lexicographically smallest pair —
``learn_bpe`` is a pure function of the word-frequency multiset, so any
engine that counts the same words learns bit-identical merges.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from etl_instagram_spark.functions.text import _WS_CLASS

EOW = "</w>"  # end-of-word sentinel symbol (never merges across words)

# the one word-splitting definition, spelled identically on every engine:
# Spark F.split / DuckDB string_split_regex / Python re all get this class
WORD_SPLIT_REGEX = "[" + _WS_CLASS + "]+"
_PY_SPLIT = re.compile(WORD_SPLIT_REGEX)


def split_words(text: str) -> list[str]:
    """Python-side word split — same regex class, same lowercasing, same
    empty-string drop as the distributed :func:`word_frequencies` path
    and the DuckDB oracle mirror."""
    if not text:
        return []
    return [w for w in _PY_SPLIT.split(text.lower()) if w]


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word-frequency table: ``(word string, freq bigint)``.

    One explode + one groupBy — the aggregation combines map-side, so
    the shuffle carries O(distinct words per partition), not O(tokens).
    This is the only corpus-wide stage of BPE training."""
    return (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT_REGEX)
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def collect_word_frequencies(
    df: DataFrame, text_col: str = "text", max_words: int = 65536
) -> list[tuple[str, int]]:
    """Collect the bounded, deterministically-ordered frequency table the
    merge loop trains on: top ``max_words`` by (freq DESC, word ASC).
    The sort-before-limit makes the result a pure function of the data
    (TakeOrdered — one bounded job), the same replayability contract as
    ``fit_ivf_centroids``'s sample; 65536 words × ~16 bytes ≈ 1 MB on
    the driver regardless of corpus size."""
    rows = (
        word_frequencies(df, text_col)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["word"], int(r["freq"])) for r in rows]


def learn_bpe(
    word_freqs: list[tuple[str, int]], n_merges: int, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency table (driver-side,
    O(vocab · n_merges)). Each word starts as its character sequence
    plus :data:`EOW`; every round counts adjacent symbol pairs weighted
    by word frequency and merges the most frequent pair (ties break on
    the lexicographically SMALLEST pair — full determinism). Stops early
    when no pair reaches ``min_freq``. Pure function of its inputs: the
    DuckDB oracle feeds it the same frequency table and gets the same
    merges."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        syms = tuple(word) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + freq
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < min_freq:
            break
        merges.append(best)
        vocab = {_merge_syms(s, best): f for s, f in vocab.items()}
    return merges


def _merge_syms(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word with a learned merge list, applying merges in
    learned order (the trainer's own replacement semantics, so training
    words round-trip to their final training segmentation). Pure
    function shared by the Arrow encoder and the oracle builder."""
    syms: tuple[str, ...] = tuple(word) + (EOW,)
    for pair in merges:
        if len(syms) < 2:
            break
        syms = _merge_syms(syms, pair)
    return list(syms)


def fit_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_freq: int = 2,
    max_words: int = 65536,
) -> list[tuple[str, str]]:
    """End-to-end trainer: distributed frequency pass → driver merge
    loop. Returns the ordered merge list."""
    return learn_bpe(
        collect_word_frequencies(df, text_col, max_words), n_merges, min_freq
    )


def bpe_token_count(text_col: str, merges: list[tuple[str, str]]) -> Column:
    """Arrow-batched token counter with a learned merge list: per-word
    memoized ``bpe_apply`` over the batch's distinct words (encoding
    cost ~ distinct words, the stemmer's memoization pattern,
    functions/stemmer.py:169). NULL/empty text counts 0."""
    cache: dict[str, int] = {}

    def _count(text: str) -> int:
        n = 0
        for w in split_words(text):
            hit = cache.get(w)
            if hit is None:
                hit = cache[w] = len(bpe_apply(w, merges))
            n += hit
        return n

    @pandas_udf(LongType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _count(t) if isinstance(t, str) else 0)

    return _udf(F.col(text_col))
