"""DSIR-style importance resampling: domain-targeted data selection.

Engine extension for training-data pipelines (the reference has no data
selection surface; its only corpus shaping is key dedup,
posts-from-hashtags.js:295-300). DSIR (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023) selects raw
documents whose hashed n-gram distribution looks like a TARGET domain:
fit cheap bag-of-hashed-ngram models on the target and the raw corpus,
weight every raw document by its log importance ratio, then draw a
without-replacement sample proportional to the weights via the Gumbel
top-k trick.

The engine follows the fit/score split of the other learned operators
(BPE, IVF/PQ, unigram/bigram LM):

- **Fit is two distributed counting passes** (one per corpus) over
  hashed unigram+bigram features, collected as a BOUNDED ``n_buckets``
  table; the smoothed per-bucket log ratios are computed ONCE in driver
  Python, so the model constants are bit-identical wherever they are
  replayed (the DuckDB parity mirror inlines the very same doubles —
  the lm.py contract).
- **Scoring is pure relational algebra**: explode hashed features,
  broadcast-join the (bucket, log_ratio) model, sum per document. No
  UDF; the model side is ``n_buckets`` rows at any corpus size.
- **Selection is deterministic Gumbel top-k**: each document's sampling
  key is ``weight + Gumbel(u)`` with ``u`` derived from
  :func:`~etl_instagram_spark.functions.text.hash32` of (id, salt) — a
  pure function of the data, so the same sample comes back under any
  partitioning and both engines agree on it. Top-k is one
  TakeOrdered: O(k) driver bytes.

Scale shape (100 TB): the raw corpus is scanned once per phase (count /
score), shuffled only by the bounded bucket key (fit) or document id
(score); nothing driver-side grows past O(n_buckets + k).
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_instagram_spark.functions.text import hash32, tokens

# Gumbel uniforms derive from a 32-bit hash: u = (h + 1) / (2^32 + 1)
# sits strictly inside (0, 1), so -ln(-ln(u)) is always finite
_U_DENOM = float(2**32 + 1)


class DsirModel(NamedTuple):
    """Fitted importance-ratio model: ``log_ratios[b]`` is
    ``ln p_target(b) − ln p_raw(b)`` for hashed-ngram bucket ``b``,
    under add-one smoothing. Driver-computed doubles — the only floats
    in play (the SQL parity mirror inlines these exact values)."""

    log_ratios: list[float]
    n_buckets: int


def hashed_ngram_features(col: Column, n_buckets: int) -> Column:
    """Hashed unigram+bigram feature ids of a text column as
    ``array<bigint>`` (one element per n-gram OCCURRENCE — counts
    matter, so no dedup). Engine-neutral: features hash through
    :func:`hash32` (md5-derived), never xxhash/murmur, so the DuckDB
    mirror computes identical bucket ids."""
    toks = F.filter(tokens(F.coalesce(col, F.lit(""))), lambda t: t != "")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(toks, bigrams)
    return F.transform(grams, lambda g: hash32(g) % n_buckets)


def bucket_counts(df: DataFrame, text_col: str, n_buckets: int) -> dict[int, int]:
    """Per-bucket feature-occurrence counts of a corpus, collected as a
    bounded dict (at most ``n_buckets`` rows reach the driver) — the
    fit-side counting pass, public so the streaming read face can count
    a fixed target corpus once (streaming/incremental.dsir_read_model)."""
    rows = (
        df.select(
            F.explode(hashed_ngram_features(F.col(text_col), n_buckets)).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )  # bounded: at most n_buckets rows reach the driver
    return {int(r["b"]): int(r["c"]) for r in rows}


def dsir_model_from_counts(
    raw_counts: dict[int, int],
    target_counts: dict[int, int],
    n_buckets: int,
) -> DsirModel:
    """Pure model math over two bucket-count tables — the SQL parity
    mirror feeds it DuckDB's counts and inlines the identical doubles
    (the :func:`~etl_instagram_spark.operators.lm.unigram_lm_from_freqs`
    contract). Add-one smoothing keeps every ratio finite."""
    raw_total = sum(raw_counts.values())
    tgt_total = sum(target_counts.values())
    lr = [
        math.log((target_counts.get(b, 0) + 1) / (tgt_total + n_buckets))
        - math.log((raw_counts.get(b, 0) + 1) / (raw_total + n_buckets))
        for b in range(n_buckets)
    ]
    return DsirModel(lr, n_buckets)


def fit_dsir(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DsirModel:
    """Fit the importance-ratio model: one counting pass per corpus.
    ``n_buckets`` bounds driver memory AND estimator variance (the
    paper's hashed feature space); 4096-16384 is the practical range —
    the model stays a broadcast either way."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    return dsir_model_from_counts(
        bucket_counts(raw_df, text_col, n_buckets),
        bucket_counts(target_df, text_col, n_buckets),
        n_buckets,
    )


def _model_df(spark, model: DsirModel) -> DataFrame:
    return spark.createDataFrame(
        list(enumerate(model.log_ratios)), "bucket long, lr double"
    )


def dsir_weights(
    df: DataFrame,
    model: DsirModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance log-weight: ``(id, n_feats, log_weight)``
    where log_weight = Σ over feature occurrences of the bucket's log
    ratio. Documents with no features keep a row with n_feats=0 and a
    NULL weight (no evidence — same convention as
    :func:`~etl_instagram_spark.operators.lm.doc_bits_per_word`).

    Plan shape: explode → broadcast join the ``n_buckets``-row model →
    per-doc aggregate → LEFT join back to the document spine."""
    spark = df.sparkSession
    scored = (
        df.select(
            F.col(id_col),
            F.explode(
                hashed_ngram_features(F.col(text_col), model.n_buckets)
            ).alias("bucket"),
        )
        .join(F.broadcast(_model_df(spark, model)), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr").alias("log_weight"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.col("log_weight"),
        )
    )


def gumbel_key(id_col: Column, log_weight: Column, salt: str = "dsir") -> Column:
    """The Gumbel top-k sampling key ``log_weight + G`` with
    ``G = −ln(−ln(u))`` and ``u`` a deterministic (id, salt)-hashed
    uniform in (0, 1): ranking by this key and taking k rows IS a
    without-replacement sample proportional to exp(log_weight)
    (Vieira 2014's Gumbel-max coupling), yet a pure function of the
    data — replayable under any partitioning and in the SQL mirror."""
    u = (hash32(F.concat(id_col.cast("string"), F.lit(f":{salt}"))) + 1) / F.lit(
        _U_DENOM
    )
    return log_weight + -F.log(-F.log(u))


def importance_sample(
    df: DataFrame,
    model: DsirModel,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Select ``k`` documents distributed like the target domain:
    Gumbel top-k over the importance weights. Returns the selected rows
    of ``df`` plus ``log_weight`` and ``sample_key`` (both rounded to 6
    dp for stable downstream comparison; the RANKING uses the unrounded
    key, ties broken by id). Documents without features never sample.
    One TakeOrdered — O(k) driver bytes at any corpus size."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_weights(df, model, text_col, id_col).filter(
        F.col("log_weight").isNotNull()
    )
    keyed = w.select(
        id_col,
        F.col("log_weight"),
        gumbel_key(F.col(id_col), F.col("log_weight"), salt).alias("__key"),
    )
    top = (
        keyed.orderBy(F.col("__key").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            F.round("log_weight", 6).alias("log_weight"),
            F.round("__key", 6).alias("sample_key"),
        )
    )
    return df.join(top, id_col)
