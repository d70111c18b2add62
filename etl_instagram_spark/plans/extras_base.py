"""Shared registry for the rotated/never-gated EXTRAS parity ledger.

``EXTRAS`` maps query name -> (spark_fn, oracle_sql), where oracle_sql
is either an ANSI-SQL string or a ZERO-ARG CALLABLE returning one (for
mirrors whose model literals are fit from the gate data — building
those at import time would read parquet on every
``import etl_instagram_spark``; the plans.oracle lazy pattern).
tests/test_rotated_parity.py applies the driver's value-and-type
compare to every row, at sf0.01, exactly like the 50-row gate.

The rows live in per-family modules (plans/extras_relational.py,
extras_docs.py, extras_emb.py, extras_events.py, extras_graph.py) —
plans/parity_extras.py imports them all and keeps the ledger's charter
and rotation history.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

EXTRAS: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str]] = {}


def _extra(name: str, sql: str):
    def deco(fn):
        EXTRAS[name] = (fn, sql)
        return fn

    return deco


def _llm(name: str):
    """Late-bound lookup of a gate-module query face (avoids importing
    plans.llm_queries at module import time)."""
    from etl_instagram_spark.plans import llm_queries

    return getattr(llm_queries, name)
