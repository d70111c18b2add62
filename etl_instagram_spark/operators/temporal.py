"""Temporal alignment operators: as-of join (nearest-earlier/-later match
per key), bucketized range join (point-in-interval without an equi-key),
and hypertable rollup (multi-resolution time aggregation from shared
finest-grain partials) — the primitives behind "frame ⋈ transcript
span", "purchase ⋈ last campaign touch", point-in-time feature lookup,
and continuous-aggregate dashboards. The reference has no event-time
surface at all (SURVEY §2.9 notes its cron batches are wall-clock only);
these are engine-native capability for the training-data pipeline brief,
where every modality join is ultimately a temporal join against a
timeline.

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
    nulls (left-outer semantics); ``tolerance`` (``'<n> <unit>'`` with a
    unit from seconds/minutes/hours/days/weeks, e.g. ``'30 minutes'``)
    nulls out matches farther than that from the left timestamp —
    malformed tolerances raise ValueError.

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
        # parse/validate FIRST ('<n> <unit>' against the unit whitelist,
        # ValueError otherwise) and build the interval from the parsed
        # seconds — the caller's string never reaches F.expr, so a
        # malformed or hostile tolerance cannot inject SQL
        tol_seconds = _interval_seconds(tolerance)
        gap = (
            F.col("__ts") - F.col("__m.__rts")
            if direction == "backward"
            else F.col("__m.__rts") - F.col("__ts")
        )
        matched = matched.withColumn(
            "__m",
            F.when(gap <= F.expr(f"INTERVAL {tol_seconds} SECONDS"), F.col("__m")),
        )

    out_left = [F.col(k) for k in keys] + [
        F.col(f"__l.{c}").alias(c) for c in left.columns if c not in keys
    ]
    out_right = [F.col("__m.__rts").alias(right_ts + suffix)] + [
        F.col(f"__m.{c}").alias(c + suffix) for c in attach
    ]
    return matched.select(*out_left, *out_right)


# ---------------------------------------------------------------------------
# bucketized range join
# ---------------------------------------------------------------------------

_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(spec: str) -> int:
    """Parse '<n> <unit>' (e.g. '30 days') into whole seconds; the
    shared validator for every interval-string parameter (range_join
    buckets, as_of_join tolerance) — ValueError on anything else."""
    parts = spec.strip().split()
    if len(parts) != 2 or not parts[0].isdigit() or parts[1].lower() not in _UNIT_SECONDS:
        raise ValueError(
            f"interval must look like '<n> <seconds|minutes|hours|days|weeks>', got {spec!r}"
        )
    n = int(parts[0]) * _UNIT_SECONDS[parts[1].lower()]
    if n < 1:
        raise ValueError(f"interval must be >= 1 second, got {spec!r}")
    return n


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    on: str | Sequence[str] | None = None,
    bucket: str = "30 days",
    how: str = "inner",
    end_inclusive: bool = False,
    suffix: str = "_r",
) -> DataFrame:
    """Join each ``left`` row (a point in time at ``point``) to every
    ``right`` row whose interval ``[start, end)`` contains it
    (``end_inclusive=True`` closes the interval), optionally also
    matching equi-keys ``on``. ``how='left'`` preserves unmatched points.

    Spark-first design — written naively (``r.start <= l.point AND
    l.point < r.end``) this is a pure non-equi join that Catalyst can
    only run as BroadcastNestedLoop or Cartesian: O(n·m) comparisons and
    a single-task collapse at scale. Instead the standard bucketization:
    both sides are mapped to fixed-width time buckets — a point lands in
    exactly ONE bucket, an interval is exploded to every bucket it
    overlaps — and the join becomes an EQUI-join on (bucket, *keys) with
    the range predicate as a residual filter. Because the point side has
    exactly one bucket row, a (point, interval) pair can meet in at most
    one bucket: no post-join dedup is needed, and left-outer semantics
    survive bucketization unchanged.

    At 100 TB: the equi-join hashes/sorts on the bucket key, so AQE
    picks broadcast/shuffled-hash/sort-merge from runtime stats and skew
    handling applies — the plan tests pin "no CartesianProduct, no
    BroadcastNestedLoopJoin". Pick ``bucket`` near the TYPICAL interval
    length: the explode factor is ceil(len/bucket)+1 rows per interval
    (shuffle amplification), while an over-wide bucket inflates the
    residual-filter false-positive rate — both are linear, so the knob
    is forgiving within an order of magnitude.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    width = _interval_seconds(bucket)

    clash = {c for c in right.columns if c in set(left.columns)}
    r_renamed = right
    for c in clash:
        r_renamed = r_renamed.withColumnRenamed(c, c + suffix)

    def _r(c: str) -> str:
        return c + suffix if c in clash else c

    lb = F.floor(F.unix_timestamp(F.col(point)) / width)
    rb_start = F.floor(F.unix_timestamp(F.col(_r(start))) / width)
    rb_end = F.floor(F.unix_timestamp(F.col(_r(end))) / width)

    l_side = left.withColumn("__rj_bucket", lb)
    # inverted intervals (end < start) can never satisfy the residual
    # range predicate, but F.sequence would step them BACKWARDS into
    # span/width bucket rows each — filter them before the explode so
    # dirty rows cost zero instead of amplifying shuffle volume
    r_side = r_renamed.filter(F.col(_r(start)) <= F.col(_r(end))).withColumn(
        "__rj_bucket", F.explode(F.sequence(rb_start, rb_end))
    )

    upper = (
        F.col(point) <= F.col(_r(end))
        if end_inclusive
        else F.col(point) < F.col(_r(end))
    )
    cond = (
        (l_side["__rj_bucket"] == r_side["__rj_bucket"])
        & (F.col(_r(start)) <= F.col(point))
        & upper
    )
    for k in keys:
        cond = cond & (l_side[k] == r_side[_r(k)])

    joined = l_side.join(r_side, cond, how).drop("__rj_bucket")
    # the right copy of each equi-key is redundant after the match
    return joined.drop(*[_r(k) for k in keys]) if keys else joined


# ---------------------------------------------------------------------------
# hypertable rollup (multi-resolution time aggregation)
# ---------------------------------------------------------------------------

# date_trunc grains ordered fine → coarse; week/month do not nest in each
# other, so coarser grains are always derived from the FINEST partials
# (never chained), and the finest grain must be day-or-finer so that
# date_trunc(coarse, date_trunc(finest, ts)) == date_trunc(coarse, ts).
_GRAIN_RANK = {
    "second": 0, "minute": 1, "hour": 2, "day": 3,
    "week": 4, "month": 4, "quarter": 5, "year": 6,
}
_DAY_OR_FINER = {"second", "minute", "hour", "day"}
_AGGS = ("sum", "count", "min", "max", "avg")


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    grains: Sequence[str],
    dims: Sequence[str] = (),
    measures: dict[str, Sequence[str]] | None = None,
    row_count: str | None = "n_rows",
    distinct_counts: Sequence[str] = (),
    hll_lg_k: int = 12,
) -> DataFrame:
    """Multi-resolution time rollup: one output row per (grain, bucket,
    *dims) for every grain in ``grains``, computed like a continuous
    aggregate — the raw table is scanned and shuffled ONCE at the finest
    grain, and every coarser grain re-aggregates those (tiny) partials.

    ``measures`` maps a column to aggregates among sum/count/min/max/avg
    (output columns ``{agg}_{col}``; avg is derived as sum/count of the
    partials, null-aware). ``row_count`` names a count(*) column, or
    None to omit it. ``distinct_counts`` lists columns to estimate
    distinct cardinality for (output ``approx_distinct_{col}``) —
    distinct counts are NOT decomposable through plain partials (day
    distincts don't sum to week distincts), so these ride as Apache
    DataSketches HLL sketches (``hll_sketch_agg`` at the finest grain,
    ``hll_union_agg`` for the merge, lossless for same-``lg_k``
    sketches): the mergeable-sketch trick that makes distinct-count
    continuous aggregates possible at all. ``hll_lg_k`` trades sketch
    size (2^lg_k bytes-ish) for error (~1.04/√2^lg_k ≈ 1.6 % at the
    default 12).

    Spark-first design — the declarative alternative, GROUPING SETS /
    ``cube`` over N date_trunc columns, expands every input row N× BEFORE
    the shuffle (Expand node), so shuffle volume scales with N·rows. Here
    the raw rows are partial-aggregated and shuffled once at the finest
    grain; each finest-grain group row is then exploded to one row per
    grain (expansion over GROUPS — at 100 TB, a few GB, not the 100 TB of
    raw rows) and a second aggregation merges the partials per (grain,
    bucket, dims). One DAG, no subplan duplication across grains, no
    materialization barrier. This is the TimescaleDB continuous-aggregate
    / OLAP-cube-from-base-cuboid pattern expressed as two DataFrame
    stages.

    Grain validity: the finest grain must be day-or-finer (week and month
    truncate differently from each other, so a week base cannot roll to
    months and vice versa); every coarser grain is derived from the
    finest, never chained.
    """
    if not grains:
        raise ValueError("grains must be non-empty")
    grains = [g.lower() for g in grains]
    for g in grains:
        if g not in _GRAIN_RANK:
            raise ValueError(f"unknown grain {g!r}; pick from {sorted(_GRAIN_RANK)}")
    finest, coarser = grains[0], grains[1:]
    if finest not in _DAY_OR_FINER:
        raise ValueError(
            f"finest grain must be day-or-finer so coarser grains nest exactly, got {finest!r}"
        )
    if any(_GRAIN_RANK[g] <= _GRAIN_RANK[finest] for g in coarser):
        raise ValueError(f"grains must go finest → coarser, got {grains!r}")
    measures = dict(measures or {})
    for c, aggs in measures.items():
        bad = [a for a in aggs if a not in _AGGS]
        if bad:
            raise ValueError(f"unsupported aggs {bad} for {c!r}; pick from {_AGGS}")

    dims = list(dims)
    # partials needed at the finest grain: every agg is decomposable
    # (avg -> sum+count), so coarser grains never touch the raw rows.
    # Track the generated alias names explicitly — identifying partials
    # by a '__' prefix scan of base.columns would misclassify any dim
    # column that happens to start with '__'.
    partials: list = []
    partial_cols: list[str] = []

    def _partial(expr, name: str) -> None:
        partials.append(expr.alias(name))
        partial_cols.append(name)

    if row_count is not None:
        _partial(F.count(F.lit(1)), "__rc")
    for c, aggs in measures.items():
        need = set(aggs)
        if "avg" in need:
            need |= {"sum", "count"}
        if "sum" in need:
            _partial(F.sum(c), f"__sum_{c}")
        if "count" in need:
            _partial(F.count(c), f"__cnt_{c}")
        if "min" in need:
            _partial(F.min(c), f"__min_{c}")
        if "max" in need:
            _partial(F.max(c), f"__max_{c}")
    for c in distinct_counts:
        _partial(F.hll_sketch_agg(c, F.lit(hll_lg_k)), f"__hll_{c}")
    if not partials:
        raise ValueError(
            "nothing to aggregate: pass row_count, measures, or "
            "distinct_counts (row_count=None with no measures/distinct_counts "
            "requests an empty agg)"
        )

    base = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("__bucket"), *dims
    ).agg(*partials)

    # fan each finest-grain group row out to every requested grain
    # (date_trunc(finest, __bucket) is the identity, so the finest level
    # rides the same explode) ...
    fanned = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).alias("grain"),
                        F.date_trunc(g, F.col("__bucket")).alias("bucket"),
                    )
                    for g in grains
                ]
            )
        ).alias("__g"),
        *dims,
        *partial_cols,
    )

    # ... then merge partials per (grain, bucket, dims): sums and counts
    # add; min/max nest; HLL sketches union (lossless at equal lg_k)
    def _merge(p: str):
        if p.startswith("__min"):
            return F.min
        if p.startswith("__max"):
            return F.max
        if p.startswith("__hll"):
            return F.hll_union_agg
        return F.sum

    merged = fanned.groupBy(
        F.col("__g.grain").alias("grain"), F.col("__g.bucket").alias("bucket"), *dims
    ).agg(*[_merge(p)(F.col(p)).alias(p) for p in partial_cols])

    out = [F.col("grain"), F.col("bucket"), *dims]
    if row_count is not None:
        out.append(F.col("__rc").alias(row_count))
    for c, aggs in measures.items():
        for a in aggs:
            if a == "avg":
                out.append((F.col(f"__sum_{c}") / F.col(f"__cnt_{c}")).alias(f"avg_{c}"))
            elif a == "count":
                out.append(F.col(f"__cnt_{c}").alias(f"count_{c}"))
            else:
                out.append(F.col(f"__{a}_{c}").alias(f"{a}_{c}"))
    for c in distinct_counts:
        out.append(
            F.hll_sketch_estimate(F.col(f"__hll_{c}")).alias(f"approx_distinct_{c}")
        )
    return merged.select(*out)


def gapfill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Time-bucket gap filling (the TimescaleDB ``time_bucket_gapfill``
    shape): bucket observations per key, then emit EVERY bucket of the
    grid — missing ones carried with both LOCF (last observation
    carried forward) and linear interpolation between the neighboring
    observed buckets.

    Output: (key, bucket_ts, n_obs, value_obs, value_locf,
    value_linear) where value_obs is the bucket's observed mean (NULL
    on gaps), n_obs = 0 marks filled rows, and leading gaps stay NULL
    under both fills (nothing to carry).

    Scale shape: one aggregation to buckets, one per-key grid built
    from a ``sequence()`` explode of the (start, end) range — O(keys ×
    buckets) rows, independent of raw event count — and three window
    passes over that grid, all partitioned by key. No UDF, no driver
    loop; the grid bounds are either caller literals or one bounded
    min/max aggregate. ``bucket`` accepts the validated interval specs
    of :func:`_interval_seconds`."""
    from pyspark.sql import Window

    step = _interval_seconds(bucket)
    # floor, not cast-truncation: they differ on pre-1970 (negative
    # epoch) timestamps, and the DuckDB mirror floors
    b = F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            b.alias("b"),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "b")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.avg("v"), 6).alias("value_obs"),
        )
    )
    if start is not None and end is not None:
        lo = F.lit(start).cast("timestamp")
        hi = F.lit(end).cast("timestamp")
        bounds = obs.select("key").distinct().select(
            "key",
            F.floor(F.unix_timestamp(lo) / step).cast("long").alias("lo"),
            F.floor(F.unix_timestamp(hi) / step).cast("long").alias("hi"),
        )
    else:
        bounds = obs.groupBy("key").agg(
            # b is already a floored bucket multiple of step, so this
            # division is exact for negatives too
            F.floor(F.min("b") / step).cast("long").alias("lo"),
            F.floor(F.max("b") / step).cast("long").alias("hi"),
        )
    grid = bounds.select(
        "key",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("i"),
    ).select("key", (F.col("i") * step).alias("b"))
    g = grid.join(obs, ["key", "b"], "left")
    w_past = (
        Window.partitionBy("key")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("key")
        .orderBy("b")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("value_obs", ignorenulls=True).over(w_past)
    prev_b = F.last(
        F.when(F.col("value_obs").isNotNull(), F.col("b")), ignorenulls=True
    ).over(w_past)
    next_v = F.first("value_obs", ignorenulls=True).over(w_next)
    next_b = F.first(
        F.when(F.col("value_obs").isNotNull(), F.col("b")), ignorenulls=True
    ).over(w_next)
    frac = (F.col("b") - prev_b) / F.nullif(next_b - prev_b, F.lit(0))
    linear = F.when(
        F.col("value_obs").isNotNull(), F.col("value_obs")
    ).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            F.round(prev_v + (next_v - prev_v) * frac, 6),
        ).otherwise(prev_v)  # trailing gaps degrade to LOCF; leading stay NULL
    )
    return g.select(
        F.col("key").alias(key_col),
        F.col("b").cast("timestamp").alias("bucket_ts"),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        "value_obs",
        prev_v.alias("value_locf"),
        linear.alias("value_linear"),
    )


def rolling_zscore(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback: int = 100,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each observation is
    scored against the mean/sample-stddev of its ``lookback`` PRECEDING
    observations (strictly before the current row, so a spike never
    suppresses its own detection). Output keeps every row with
    ``(z_score, is_anomaly)``; rows whose trailing window has fewer
    than 2 points or zero variance carry NULL z and are never flagged.

    One window pass partitioned by key — the shuffle is by ``key_col``
    and state per row is O(lookback) within the sorted partition. At
    skewed-key scale, pre-bucket by (key, time-range) and run per
    bucket with ``lookback`` rows of overlap carried from the previous
    bucket."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-lookback, -1)
    )
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.round((F.col(value_col) - mu) / F.nullif(sd, F.lit(0.0)), 4)
    return df.select(
        key_col,
        ts_col,
        id_col,
        value_col,
        z.alias("z_score"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def ewma_weights(alpha: float, window: int) -> list[float]:
    """The fixed weight ladder (1−α)^j, j = 0 (current row) … window−1 —
    Python-computed doubles interpolated as literals into BOTH engines,
    so the smoother's arithmetic cannot drift (the hash32_sql
    convention applied to floats)."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    return [(1.0 - alpha) ** j for j in range(window)]


def ewma_smooth(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.3,
    window: int = 8,
) -> DataFrame:
    """Bounded-window exponential smoothing per key: each row gains
    ``ewma`` = Σ_j (1−α)^j·x_{t−j} / Σ_j (1−α)^j over the ``window``
    most recent observations (current row = j 0), ordered by
    (ts, id) for a total order. The BOUNDED window is what makes the
    smoother replayable: the textbook recurrence s_t = αx_t+(1−α)s_{t−1}
    reaches back to the series start (either a sequential scan or an
    exp/ln rewrite whose libm last-ulp behavior is engine-specific),
    while a fixed ladder of literal weights unrolls to one deterministic
    per-row expression — same additions in the same order in Spark and
    DuckDB (mirror: :func:`ewma_sql_expr`), truncation bias at the
    window edge < (1−α)^window (≈ 6 % of a weight at the defaults,
    0.06 % of the total).

    One window pass partitioned by key (the rolling_zscore scale shape);
    ``ewma`` is rounded to 6dp. Short heads (fewer than ``window`` rows)
    renormalize over the weights actually present — the first row's
    ewma is exactly its own value."""
    weights = ewma_weights(alpha, window)
    # NULL values are dropped up front: Spark's collect_list skips
    # NULLs while DuckDB's list() keeps them, so a NULL mid-series
    # would silently misalign the two engines' windows
    df = df.filter(F.col(value_col).isNotNull())
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    n = F.size(arr)
    num = None
    den = None
    for j, wt in enumerate(weights):
        term = F.when(n > j, F.element_at(arr, n - j) * F.lit(wt))
        dterm = F.when(n > j, F.lit(wt))
        num = term if num is None else num + F.coalesce(term, F.lit(0.0))
        den = dterm if den is None else den + F.coalesce(dterm, F.lit(0.0))
    return df.select(
        key_col,
        ts_col,
        id_col,
        value_col,
        F.round(num / den, 6).alias("ewma"),
    )


def ewma_sql_expr(alpha: float, window: int, arr: str = "arr") -> str:
    """DuckDB expression mirroring the unrolled ewma over a windowed
    ``list(value)`` column named ``arr`` — generated from the same
    :func:`ewma_weights` ladder, additions in the same order."""
    weights = ewma_weights(alpha, window)
    num = " + ".join(
        f"COALESCE(CASE WHEN len({arr}) > {j} THEN"
        f" {arr}[len({arr}) - {j}] * {w!r} END, 0.0)"
        for j, w in enumerate(weights)
    )
    den = " + ".join(
        f"COALESCE(CASE WHEN len({arr}) > {j} THEN {w!r} END, 0.0)"
        for j, w in enumerate(weights)
    )
    return f"round(({num}) / ({den}), 6)"
