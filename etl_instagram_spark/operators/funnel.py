"""Behavioral analytics over event streams: ordered-step funnels and
cohort retention.

The reference's analytics stop at engagement aggregates (SURVEY A6);
these are the next queries a social/product dataset gets asked —
"how many users view → click → purchase, and how fast?" and "of the
users who arrived in week W, how many come back k weeks later?" Both
are pure relational compositions (conditional aggregation + key-equi
joins + window-free group math), so they replay exactly in oracle SQL
and hold no per-user driver state.

Funnel semantics (documented precisely because engines disagree):
EARLIEST-ANCHOR GREEDY — t1 is the user's earliest step-1 event; each
subsequent step takes the earliest qualifying event STRICTLY after the
previous step and within ``within_seconds`` of t1. Deterministic and
replayable; NOT the maximal-chain semantics (a later anchor could
occasionally reach deeper — ClickHouse's windowFunnel makes the same
trade in its default mode). Timestamps compare on whole epoch seconds
(``floor(epoch)``, the repo's cross-engine timestamp convention).

Scale shape: step k is one filtered scan joined to the (user-keyed,
one-row-per-user) survivor frame of step k-1 — k-1 key-equi joins
total, each shrinking; no window over the raw event stream, no
per-user collect. Cohort retention is two grouped scans and one join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch(ts: Column) -> Column:
    """Whole-second epoch — matches oracle ``floor(epoch(ts))``."""
    return F.floor(F.unix_timestamp(ts)).cast("long")


def funnel_users(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[Column],
    within_seconds: int,
) -> DataFrame:
    """Per-user funnel outcome: (user, level, t1, t_last) where
    ``level`` ∈ [1, len(steps)] is the deepest step reached under the
    earliest-anchor semantics and t1/t_last are epoch seconds of the
    anchor and of the deepest step's event. Users who never fire
    step 1 are absent."""
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {len(steps)}")
    if within_seconds <= 0:
        raise ValueError(f"within_seconds must be > 0, got {within_seconds}")
    u = F.col(user_col)
    base = events.select(
        u.alias("__u"),
        _epoch(F.col(ts_col)).alias("__t"),
        *[s.cast("boolean").alias(f"__s{i}") for i, s in enumerate(steps)],
    )
    cur = (
        base.filter(F.col("__s0"))
        .groupBy("__u")
        .agg(F.min("__t").alias("__t1"))
        .select("__u", "__t1", F.col("__t1").alias("__tprev"), F.lit(1).alias("__lvl"))
    )
    frames = [cur]
    for i in range(1, len(steps)):
        nxt = (
            base.filter(F.col(f"__s{i}"))
            .join(cur.select("__u", "__t1", "__tprev"), "__u")
            .filter(
                (F.col("__t") > F.col("__tprev"))
                & (F.col("__t") <= F.col("__t1") + F.lit(within_seconds))
            )
            .groupBy("__u", "__t1")
            .agg(F.min("__t").alias("__tnext"))
            .select(
                "__u",
                "__t1",
                F.col("__tnext").alias("__tprev"),
                F.lit(i + 1).alias("__lvl"),
            )
        )
        frames.append(nxt)
        cur = nxt
    # deepest frame a user appears in = their level: anti-join each
    # frame against the next (a user in frame i+1 is not "stopped" at i)
    out = None
    for i, fr in enumerate(frames):
        stopped = (
            fr.join(frames[i + 1].select("__u"), "__u", "left_anti")
            if i + 1 < len(frames)
            else fr
        )
        part = stopped.select(
            F.col("__u").alias(user_col),
            F.col("__lvl").alias("level"),
            F.col("__t1").alias("t1"),
            F.col("__tprev").alias("t_last"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def funnel_summary(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    steps: list[Column],
    within_seconds: int,
) -> DataFrame:
    """The funnel report: one row per level with ``n_reached`` (users
    whose deepest step is ≥ level — the classic decreasing funnel
    column), ``n_stopped`` (exactly this level), and
    ``avg_secs_to_here`` over users stopping here (NULL at level 1 in
    the degenerate all-anchors case t_last == t1 → 0.0)."""
    per_user = funnel_users(events, user_col, ts_col, steps, within_seconds)
    by_level = per_user.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_stopped"),
        F.round(
            F.sum(F.col("t_last") - F.col("t1")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_secs_to_here"),
    )
    # n_reached(level) = Σ n_stopped(level' >= level): a tiny frame
    # (|levels| rows) — window over it is fine at any scale
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col("level").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        by_level.withColumn("n_reached", F.sum("n_stopped").over(w))
        .select("level", "n_reached", "n_stopped", "avg_secs_to_here")
        .orderBy("level")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int = 8,
) -> DataFrame:
    """Weekly cohort retention: cohort = date_trunc(week) of the user's
    first event; a user is retained at offset k if they have ANY event
    in cohort_week + k weeks. Returns (cohort_week, week_offset,
    n_active, cohort_size, retention_pct) for offsets 0..max_offset.
    date_trunc('week') starts Monday in both Spark and DuckDB (the
    hypertable-rollup precedent). Two grouped scans + one key-equi
    join; retention_pct is round(100·n_active/cohort_size, 4)."""
    if max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    u, ts = F.col(user_col), F.col(ts_col)
    firsts = (
        events.groupBy(u.alias("__u"))
        .agg(F.min(ts).alias("__first"))
        .select("__u", F.date_trunc("week", F.col("__first")).alias("__cohort"))
    )
    active = events.select(
        u.alias("__u"), F.date_trunc("week", ts).alias("__week")
    ).distinct()
    cohort_sizes = firsts.groupBy("__cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = (
        active.join(firsts, "__u")
        .withColumn(
            # datediff on the DATE parts: week boundaries are exact
            # multiples of 7 days apart in the session calendar, so this
            # is timezone-robust (epoch-second division would be off by
            # one across a DST transition under a non-UTC session)
            "week_offset",
            F.floor(
                F.datediff(F.to_date("__week"), F.to_date("__cohort")) / 7
            ).cast("long"),
        )
        .filter(
            (F.col("week_offset") >= 0) & (F.col("week_offset") <= max_offset)
        )
        .groupBy("__cohort", "week_offset")
        .agg(F.countDistinct("__u").alias("n_active"))
    )
    return (
        joined.join(cohort_sizes, "__cohort")
        .select(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") * 100.0 / F.col("cohort_size"), 4
            ).alias("retention_pct"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def transition_matrix(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
) -> DataFrame:
    """First-order Markov transitions over each user's event sequence:
    (from_state, to_state, n_transitions, prob) with ``prob`` the
    row-normalized transition probability rounded to 6dp — the
    behavioral "what happens next" model (and the audit input for
    sequence-synthesis sanity checks). Consecutive pairs are taken per
    user under the (ts, id) TOTAL order, so same-timestamp events
    transition deterministically.

    One lag window partitioned by user + one counting groupBy; the
    matrix is |states|² rows regardless of input size, and the
    normalizing sum runs over that tiny frame."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.select(
            F.col(user_col),
            F.lag(F.col(type_col)).over(w).alias("from_state"),
            F.col(type_col).alias("to_state"),
        )
        .filter(F.col("from_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wf = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(wf).cast("double"),
            6,
        ).alias("prob"),
    ).orderBy("from_state", "to_state")
