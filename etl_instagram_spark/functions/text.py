"""Text-analysis column kernels — pure Spark SQL expressions (no UDFs).

Everything here compiles to JVM-side Catalyst expressions inside
whole-stage codegen; the engine-neutral definitions (md5-based hashing,
whitespace tokenization) are chosen so a SQL oracle (DuckDB) can compute
bit-identical results for the correctness gate.

Reference lineage (SURVEY §2.7): tokenize F3 (lda/index.js:34), normalize
F5 (:38), stopword/short/url drop F7 (:40), plus the LLM-data-pipeline
text operators (language-ID, quality scoring, token counting, rolling-hash
fingerprinting) the engine adds for large-scale training-data prep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 31-bit Mersenne prime: keeps (a * x + b) % P inside int64 for a,b < 2^31.
HASH_PRIME = 2_147_483_647

# Minimal in-expression stopword lists (the full EN/ES lists from the
# reference live in functions/stopwords.py for the ML pipeline; these
# compact marker sets drive the deterministic language-ID heuristic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "los", "que", "y", "en", "un"),
    "fr": ("le", "la", "les", "des", "et", "que", "une", "dans"),
    "de": ("der", "die", "das", "und", "nicht", "ein", "mit", "ist"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text (F3/F5)."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Number of whitespace tokens; 0 for empty/blank text."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>; whole text when shorter
    than n tokens. 1-based element access mirrors the SQL oracle."""
    t = tokens(col)
    parts = [F.element_at(t, F.col("__i") + j) for j in range(n)]
    # build via transform over 1..len-n+1
    return F.when(F.size(t) < n, F.array(F.concat_ws(" ", *[F.element_at(t, j + 1) for j in range(0)] ) if False else F.trim(F.lower(col)))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
        )
    )


def hash32(col: Column) -> Column:
    """Deterministic, engine-neutral 32-bit hash of a string: the first 8
    hex chars of md5, as a bigint. md5 is identical in Spark and DuckDB,
    so the oracle reproduces this exactly (unlike xxhash64/murmur)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def affine_hash(x: Column, a: int, b: int, p: int = HASH_PRIME) -> Column:
    """Universal-hash family h(x) = (a * (x % p) + b) % p, overflow-safe
    for a,b < 2^31 (product < 2^62 < int64 max)."""
    return (F.lit(a) * (x % F.lit(p)) + F.lit(b)) % F.lit(p)


def rolling_fingerprint(col: Column, shingle_chars: int = 8) -> Column:
    """Document fingerprint: minimum 32-bit hash over all character
    shingles (winnowing-style rolling-hash min). Near-identical docs
    collide; any single-char edit changes it with prob ~1/len."""
    n = F.greatest(F.length(col) - (shingle_chars - 1), F.lit(1))
    return F.array_min(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: hash32(F.substring(col, 1, 0x7FFFFFFF).substr(i, F.lit(shingle_chars))),
        )
    )


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are punctuation (quality signal)."""
    cleaned = F.regexp_replace(col, r"[^.!?,;:]", "")
    return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
        F.length(cleaned).cast("double") / F.length(col)
    )


def mean_token_len(col: Column) -> Column:
    t = tokens(col)
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        F.aggregate(t, F.lit(0L) if False else F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast("double")
        / F.size(t)
    )


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    """Fraction of tokens that are (English) stopwords — high for natural
    prose, low for boilerplate/code — a standard quality heuristic."""
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(hits.cast("double") / F.size(t))


def quality_score(col: Column) -> Column:
    """Composite 0-1 quality score: length band + stopword presence −
    punctuation excess. Deterministic and SQL-mirrorable; thresholds are
    conventional training-data-filter values, not learned."""
    length_ok = (F.length(col) >= 100) & (F.length(col) <= 20000)
    sw = stopword_ratio(col)
    pr = punct_ratio(col)
    return F.round(
        length_ok.cast("double") * 0.4
        + F.least(sw * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(pr * F.lit(10.0), F.lit(1.0))) * 0.2,
        4,
    )


def lang_marker_hits(col: Column, lang: str) -> Column:
    """Count of tokens that are stopword markers of ``lang``."""
    t = tokens(col)
    return F.size(F.filter(t, lambda x: x.isin(*LANG_MARKERS[lang])))


def detect_language(col: Column) -> Column:
    """Argmax language by marker-stopword hits; 'und' when all zero.
    Tie-break = fixed language order (en, es, fr, de) — mirrored in SQL."""
    hits = {lang: lang_marker_hits(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr
