"""Temporal alignment operators: as-of join (nearest-earlier/-later match
per key) — the primitive behind "frame ⋈ transcript span", "purchase ⋈
last campaign touch", and point-in-time feature lookup. The reference has
no event-time surface at all (SURVEY §2.9 notes its cron batches are
wall-clock only); this is engine-native capability for the training-data
pipeline brief, where every modality join is ultimately an as-of join
against a timeline.

Spark-first design — the naive formulation is a non-equi range join
(``l.key = r.key AND r.ts <= l.ts`` + a per-row argmax), which Catalyst
can only execute as a broadcast nested-loop or cartesian and which
explodes at scale. Instead the standard scale shape: UNION both sides
tagged by origin, ONE shuffle on the key, and a running
``last(..., ignorenulls=True)`` window over (ts, side) order — each
left row picks up the latest right row at-or-before it in a single
ordered pass per key. O(n log n) sort per partition, no pair blowup,
and the window's running frame is whole-stage-codegen friendly.

At 100 TB: one Exchange on the join key (tests pin exchange_count == 1);
skewed keys fall to AQE; the sort is the same price a SortMergeJoin
would pay. Tolerance bounds staleness, not state — state per key is one
row regardless.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left-join each ``left`` row to the nearest ``right`` row per key:
    the latest with ``right_ts <= left_ts`` (``direction='backward'``,
    default) or the earliest with ``right_ts >= left_ts``
    (``'forward'``). Equal timestamps match. Unmatched left rows keep
    nulls (left-outer semantics); ``tolerance`` (an SQL interval string
    like ``'30 minutes'``) nulls out matches farther than that from the
    left timestamp.

    Attached columns: ``right_cols`` (default: every right column except
    the keys and ``right_ts``) plus the matched right timestamp, all
    renamed with ``suffix``.

    Ties on the right side (same key, same timestamp) are broken by the
    largest attached-value struct, deterministically — pre-aggregate the
    right side to one row per (key, ts) when ties carry meaning.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    attach = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    l_payload = F.struct(*[F.col(c) for c in left.columns if c not in keys])
    r_payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in attach]
    )
    l_type = left.select(l_payload.alias("p")).schema["p"].dataType
    r_type = right.select(r_payload.alias("p")).schema["p"].dataType

    sides = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_payload.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    ).unionByName(
        right.select(
            *keys,
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            F.lit(None).cast(l_type).alias("__l"),
            r_payload.alias("__r"),
        )
    )

    # backward: ascending ts scan, right rows first at equal ts, running
    # last(right) = latest right at-or-before. forward: the mirror image
    # (descending scan finds the earliest right at-or-after). The __r
    # tie-break makes equal-(key, ts) right rows deterministic.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc(), F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        sides.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )

    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__m.__rts")
            if direction == "backward"
            else F.col("__m.__rts") - F.col("__ts")
        )
        matched = matched.withColumn(
            "__m",
            F.when(gap <= F.expr(f"INTERVAL {tolerance}"), F.col("__m")),
        )

    out_left = [F.col(k) for k in keys] + [
        F.col(f"__l.{c}").alias(c) for c in left.columns if c not in keys
    ]
    out_right = [F.col("__m.__rts").alias(right_ts + suffix)] + [
        F.col(f"__m.{c}").alias(c + suffix) for c in attach
    ]
    return matched.select(*out_left, *out_right)
