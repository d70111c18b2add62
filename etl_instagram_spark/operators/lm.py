"""N-gram language-model perplexity scoring (the CCNet quality signal).

Engine extension for training-data pipelines (the reference has no LM
surface). CCNet (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020) buckets crawl text
by language-model perplexity and keeps the low-perplexity head; this
module provides that signal with the same fit/score split the engine's
other learned operators use (BPE, IVF, PQ):

- **Fit is one distributed counting pass** over the corpus (the
  tokenizer module's word-frequency shuffle) collected as a BOUNDED,
  deterministically-ordered table, with add-one-smoothed log2
  probabilities computed ONCE in driver Python — so the model constants
  are bit-identical wherever they are replayed (the SQL parity mirror
  inlines the very same doubles).
- **Scoring is pure relational algebra**: explode words, LEFT join the
  broadcast (word, logp) model, coalesce misses to the model's OOV
  floor, aggregate bits-per-word per document. No UDF anywhere — the
  hot path is codegen'd joins and aggregates, and at 100 TB the model
  side is a broadcast of at most ``max_vocab`` rows.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_instagram_spark.operators.tokenizer import (
    WORD_SPLIT_REGEX,
    collect_word_frequencies,
)


class UnigramLM(NamedTuple):
    """A fitted unigram model: ``entries`` is [(word, log2 p)] over the
    capped vocabulary; ``oov_logp`` the smoothed floor for unseen words.
    Both carry driver-computed doubles — the only floats in play."""

    entries: list[tuple[str, float]]
    oov_logp: float


def fit_unigram_lm(
    df: DataFrame, text_col: str = "text", max_vocab: int = 65536
) -> UnigramLM:
    """Fit an add-one-smoothed unigram LM from one distributed counting
    pass: p(w) = (c(w)+1) / (total + V + 1), with the +1 mass in the
    denominator shared by every unseen word (the OOV floor). The
    frequency table is collected sorted (freq DESC, word ASC) and capped,
    so the model is a pure function of the data — same replayability
    contract as ``fit_pq_codebooks`` / ``learn_bpe``."""
    return unigram_lm_from_freqs(collect_word_frequencies(df, text_col, max_vocab))


def unigram_lm_from_freqs(freqs: list[tuple[str, int]]) -> UnigramLM:
    """Pure model math over a frequency table — the SQL parity mirror
    feeds it DuckDB's counts and inlines the identical doubles."""
    total = sum(f for _, f in freqs)
    v = len(freqs)
    denom = float(total + v + 1)
    entries = [(w, math.log2((c + 1) / denom)) for w, c in freqs]
    return UnigramLM(entries, math.log2(1.0 / denom))


def _model_df(spark: SparkSession, lm: UnigramLM) -> DataFrame:
    return spark.createDataFrame(lm.entries, "word string, logp double")


def doc_bits_per_word(
    df: DataFrame,
    lm: UnigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM score: ``(id, n_words, bits_per_word)`` where
    bits_per_word = mean −log2 p(word) (perplexity = 2^bits_per_word).
    Documents with no words keep a row with n_words=0 and NULL score.

    Plan shape: explode → broadcast LEFT join the model → per-doc
    aggregate, then a LEFT join back to the document spine so empty/NULL
    docs survive. The corpus is shuffled once, keyed by document id."""
    spark = df.sparkSession
    words = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT_REGEX)
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .join(F.broadcast(_model_df(spark, lm)), "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.avg(-F.coalesce(F.col("logp"), F.lit(lm.oov_logp))).alias(
                "bits_per_word"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(words, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
            F.col("bits_per_word"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    lm: UnigramLM,
    max_bits: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the low-perplexity head: documents whose bits_per_word is at
    most ``max_bits``. Wordless documents carry no LM evidence and are
    dropped (CCNet discards them before bucketing)."""
    scored = doc_bits_per_word(df, lm, text_col, id_col)
    keep = scored.filter(
        (F.col("n_words") > 0) & (F.col("bits_per_word") <= max_bits)
    ).select(id_col)
    return df.join(keep, id_col, "semi")


def unigram_model_sql_values(lm: UnigramLM) -> str:
    """The model as a SQL VALUES list ``('word', logp), ...`` — the
    parity mirror inlines exactly the doubles the Spark plan broadcasts
    (repr round-trips), so both engines score from identical constants."""
    return ", ".join(
        "('{}', {!r})".format(w.replace("'", "''"), lp) for w, lp in lm.entries
    )


# ---------------------------------------------------------------------------
# bigram LM with stupid backoff
# ---------------------------------------------------------------------------

BACKOFF = 0.4  # Brants et al. 2007 ("Large Language Models in MT") constant


class BigramLM(NamedTuple):
    """Stupid-backoff bigram model: ``bigram_entries`` is
    [((prev, word), log2 c(prev,word)/c(prev))] over observed pairs;
    unseen pairs back off to log2(BACKOFF) + unigram log-prob. All
    doubles are driver-computed once (replayable as literals)."""

    unigram: UnigramLM
    bigram_entries: list[tuple[str, str, float]]
    backoff_logp: float


def bigram_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed adjacent-pair counts WITHIN each document:
    ``(prev string, word string, freq bigint)``. Pairs are built
    positionally (zip the filtered word array against itself shifted by
    one) so empty-string splitter artifacts never break adjacency; one
    explode + one map-side-combined groupBy, same cost shape as
    :func:`word_frequencies`."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT_REGEX),
        lambda w: w != "",
    )
    n = F.size(words)
    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("prev"), b.alias("word")),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.prev", "p.word")
        .groupBy("prev", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def fit_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int = 65536,
    max_bigrams: int = 262144,
) -> BigramLM:
    """Fit unigram + bigram tables in two counting passes (both bounded,
    both sorted-before-cap: freq DESC then keys ASC) and compute every
    log-probability once in driver Python — bigram scores are relative
    frequencies log2(c(prev,w)/c(prev)), unseen pairs take
    log2(BACKOFF·p_uni(w)). Bigrams whose ``prev`` fell outside the
    capped vocabulary are dropped (their context count is unknown), which
    only widens backoff — never a wrong probability."""
    uni_freqs = collect_word_frequencies(df, text_col, max_vocab)
    uni = unigram_lm_from_freqs(uni_freqs)
    context = dict(uni_freqs)
    rows = (
        bigram_frequencies(df, text_col)
        .orderBy(F.col("freq").desc(), F.col("prev").asc(), F.col("word").asc())
        .limit(max_bigrams)
        .collect()
    )
    entries = [
        (r["prev"], r["word"], math.log2(int(r["freq"]) / context[r["prev"]]))
        for r in rows
        if r["prev"] in context
    ]
    return BigramLM(uni, entries, math.log2(BACKOFF))


def doc_bits_per_word_bigram(
    df: DataFrame,
    blm: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document stupid-backoff score: the first word of a doc scores
    by unigram; every later word by its bigram entry when observed, else
    backoff + unigram. Shape: posexplode for positions, a window lag for
    the previous word, two broadcast LEFT joins (bigram then unigram),
    one per-doc aggregate — no UDF, corpus shuffled once per stage key.
    Documents with no words keep n_words=0 and NULL score."""
    from pyspark.sql import Window

    spark = df.sparkSession
    uni_df = F.broadcast(_model_df(spark, blm.unigram))
    bi_df = F.broadcast(
        spark.createDataFrame(
            blm.bigram_entries, "prev string, word string, bi_logp double"
        )
    )
    words = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT_REGEX),
        lambda w: w != "",
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    scored = (
        df.select(F.col(id_col), F.posexplode(words).alias("pos", "word"))
        .withColumn("prev", F.lag("word").over(w))
        .join(bi_df, ["prev", "word"], "left")
        .join(uni_df, "word", "left")
        .withColumn(
            "logp",
            F.coalesce(
                F.col("bi_logp"),
                # backoff (or doc-initial) → discounted unigram; the
                # discount is dropped for the FIRST word, which has no
                # context to back off from
                F.when(
                    F.col("prev").isNull(), F.lit(0.0)
                ).otherwise(F.lit(blm.backoff_logp))
                + F.coalesce(F.col("logp"), F.lit(blm.unigram.oov_logp)),
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.avg(-F.col("logp")).alias("bits_per_word"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
            F.col("bits_per_word"),
        )
    )


def bigram_model_sql_values(blm: BigramLM) -> str:
    """Bigram entries as SQL VALUES ``('prev', 'word', logp), ...`` with
    the identical driver doubles (repr round-trip)."""
    return ", ".join(
        "('{}', '{}', {!r})".format(
            p.replace("'", "''"), w.replace("'", "''"), lp
        )
        for p, w, lp in blm.bigram_entries
    )


def perplexity_filter_bigram(
    df: DataFrame,
    blm: BigramLM,
    max_bits: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`perplexity_filter`'s bigram-scored sibling: keep documents
    whose stupid-backoff bits-per-word is at most ``max_bits``
    (wordless docs carry no evidence and are dropped)."""
    scored = doc_bits_per_word_bigram(df, blm, text_col, id_col)
    keep = scored.filter(
        (F.col("n_words") > 0) & (F.col("bits_per_word") <= max_bits)
    ).select(id_col)
    return df.join(keep, id_col, "semi")


def perplexity_buckets(
    df: DataFrame,
    lm: UnigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str | None = None,
    bucket_col: str = "ppl_bucket",
    cuts: tuple[float, float] = (1 / 3, 2 / 3),
) -> DataFrame:
    """CCNet head/middle/tail bucketing (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data",
    LREC 2020): rank documents by LM bits-per-word and cut the
    distribution at ``cuts`` — the head (lowest perplexity) is the
    cleanest slice, the tail the noisiest; training recipes sample the
    buckets at different rates. ``by`` ranks within a partition column
    (CCNet buckets per language) instead of globally.

    Adds ``bucket_col`` ∈ {head, middle, tail} plus ``bits_per_word``;
    wordless docs get a NULL bucket (no LM evidence — CCNet drops them
    before bucketing, the caller chooses). Ranks use percent_rank over
    the deterministic (bits_per_word, id) order, so bucket assignment
    is a pure function of the data — no tie ambiguity, any
    partitioning.

    Scale: one score pass (broadcast model join, corpus shuffled once
    by id) plus one window over (by,) — per-language windows
    parallelize across languages; a GLOBAL three-way cut on 100 TB
    should prefer approx quantile cutoffs instead of a single total
    order (documented trade; ``by`` is the scale path)."""
    from pyspark.sql import Window

    lo, hi = cuts
    if not 0.0 < lo < hi < 1.0:
        raise ValueError(f"cuts must satisfy 0 < lo < hi < 1, got {cuts}")
    scored = doc_bits_per_word(df, lm, text_col, id_col)
    joined = df.join(
        scored.select(id_col, "n_words", "bits_per_word"), id_col
    )
    # wordless docs must leave the window BEFORE ranking: their NULL
    # scores would otherwise sort first and shift every real rank
    wordy = joined.filter(F.col("n_words") > 0)
    wordless = joined.filter(~(F.col("n_words") > 0)).withColumn(
        bucket_col, F.lit(None).cast("string")
    )
    part = [by] if by else []
    w = Window.partitionBy(*part).orderBy("bits_per_word", id_col)
    ranked = (
        wordy.withColumn("__pr", F.percent_rank().over(w))
        .withColumn(
            bucket_col,
            F.when(F.col("__pr") <= F.lit(lo), F.lit("head"))
            .when(F.col("__pr") <= F.lit(hi), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("__pr")
    )
    return ranked.unionByName(wordless)
