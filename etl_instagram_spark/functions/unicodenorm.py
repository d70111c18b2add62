"""Unicode normalization (UAX #15) — the multilingual-dedup
prerequisite the pure-expression kernels in functions/text.py cannot
provide (Spark has no built-in normalizer, so this is an honest
Arrow-batched pandas-UDF boundary, the functions/stemmer.py pattern).

Why it matters at 100 TB: the same text crawled from two sources can
differ only in composition form (``é`` vs ``e`` + the combining acute),
and every downstream content hash, shingle, minhash, and exact-dedup
key then misses the duplicate. Normalizing to NFC first makes byte
equality mean CONTENT equality. NFC is the form with a cross-engine
mirror (DuckDB ``nfc_normalize`` implements the same UAX #15 canonical
composition); the compatibility forms (NFKC/NFKD) and NFD are
pytest-covered only.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Normalize a string column to ``form`` (stdlib unicodedata
    semantics via pandas ``str.normalize``). NULLs pass through.

    Scale: per-row scan-stage map, embarrassingly parallel,
    Arrow-batched — never row-at-a-time Python."""
    if form not in _FORMS:
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm(col)


def unicode_normalize_sql(expr: str) -> str:
    """DuckDB mirror for the NFC form (``nfc_normalize`` — the same
    UAX #15 canonical composition the pandas UDF applies)."""
    return f"nfc_normalize({expr})"
