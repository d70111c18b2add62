"""Scan-stage Bloom membership filters.

A Bloom filter lets a 100-TB scan discard rows/shingles BEFORE any
shuffle or join when the interesting key set is small-ish (an eval
set's shingles, a blocklist, yesterday's content hashes): k hashed bit
probes against a broadcast bit array, all inside whole-stage codegen —
no false negatives ever, false positives at a chosen rate that only
cost a little wasted downstream work.

Everything is Spark-side: the bits are SET by a distributed
``xxhash64``-probe aggregation and TESTED by the same ``xxhash64``
expressions, so set/test consistency is by construction (a driver-side
Python hash could silently disagree with the JVM's and break the
no-false-negative guarantee). The bit array travels as a one-row
broadcast frame (the BM25 corpus-stats pattern), never as a plan
literal — a 10⁷-bit filter is ~1.2 MB, fine to broadcast, hopeless to
inline in an expression tree.

The reference has a membership surface of exactly this shape — the
user-id blocklist filter (posts-from-hashtags.js:243-249, a 3-entry
array scanned per post); this generalizes it to key sets far past
broadcast-join comfort.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MAX_K = 8


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m = ceil(−n·ln p / ln²2) bits (rounded up to a
    whole 64-bit word), k = round((m/n)·ln 2) probes clamped to
    [1, 8] — beyond 8 probes the per-row cost buys negligible fpp."""
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1, got {n_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, min(_MAX_K, round(m / n_items * math.log(2))))
    return m, k


def _probe(col: Column, i: int, m_bits: int, seed: int) -> Column:
    # pmod folds xxhash64's signed range into [0, m)
    return F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(m_bits))


def build_bloom(
    df: DataFrame,
    col: str | Column,
    m_bits: int,
    k: int,
    seed: int = 42,
) -> list[int]:
    """Build the bit array distributed: explode each value into its k
    probe positions, OR the bits per 64-bit word (map-side partial
    ``bit_or``), collect the ≤ m/64 word rows. Driver memory is
    O(m_bits/64) longs regardless of row count. NULL values are
    skipped (a NULL is not a member)."""
    if m_bits < 64 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    c = F.col(col) if isinstance(col, str) else col
    pos = (
        df.where(c.isNotNull())
        .select(
            F.explode(
                F.array(*[_probe(c, i, m_bits, seed) for i in range(k)])
            ).alias("pos")
        )
    )
    rows = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_frame(spark: SparkSession, words: list[int], name: str = "__bloom") -> DataFrame:
    """The bit array as a one-row frame for ``crossJoin(broadcast(...))``
    — each executor receives the bits once, and every probe is then a
    local array read inside codegen."""
    return spark.createDataFrame([(words,)], f"{name} array<long>")


def might_contain(
    col: Column,
    bits_col: Column,
    m_bits: int,
    k: int,
    seed: int = 42,
) -> Column:
    """Membership test: AND of k bit probes against ``bits_col`` (the
    broadcast array column from :func:`bloom_frame`). False for NULL
    input. Guaranteed true for every value inserted by
    :func:`build_bloom` under the same (m_bits, k, seed)."""
    out = col.isNotNull()
    for i in range(k):
        h = _probe(col, i, m_bits, seed)
        word = F.try_element_at(bits_col, (h / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, F.pmod(h, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        out = out & (bit == 1)
    return out
