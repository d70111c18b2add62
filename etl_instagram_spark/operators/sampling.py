"""Deterministic dataset splitting and stratified sampling for
training-data pipelines: every LLM corpus build ends with "assign each
document to train/val/test, reproducibly, with no leakage across runs"
and "downsample stratum X to fraction f" — engine-native extensions
(the reference's only sampling is the LDA sampler's seeded PRNG,
lda/index.js:279-288, which is engine- and partitioning-dependent).

Spark-first design: both operators are pure per-row projections over the
shared ``hash32`` content-hash kernel (functions/text.py) — no shuffle,
no state, no PRNG. The assignment of a row depends ONLY on its id and
the salt, so:

- re-running on different cluster sizes / partitionings gives the SAME
  split (``rand(seed)`` does not — it is seeded per-partition);
- incremental ingestion is leak-free: a doc that arrives tomorrow lands
  in the same split it would have today, and train/test membership never
  flips when the table grows;
- the oracle can replay every assignment in SQL via ``hash32_sql`` —
  the split is a value-checkable function, not a sampling event.

At 100 TB these are scan-stage column expressions: filters on the split
column push down to parquet when the split is materialized as a
partition column (the recommended layout for a frozen corpus release).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_instagram_spark.functions.text import hash32, hash32_sql

# hash32 yields 32 bits; buckets of 1e6 keep fraction resolution to 1e-6
# while staying far from the 2^32 modulus-bias floor
_BUCKETS = 1_000_000


def _bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, _BUCKETS) from (salt, id) — the salt both
    namespaces independent splits and decorrelates them from any other
    hash32 use of the same ids. ``concat`` (not ``concat_ws``) so a NULL
    id propagates to a NULL bucket, exactly like the ``||`` in
    :func:`bucket_sql` — null-id rows fall to the last split / out of
    the sample on BOTH engines instead of silently hashing the salt."""
    return (
        hash32(F.concat(F.lit(salt), F.lit("\x1f"), id_col.cast("string"))) % _BUCKETS
    )


def bucket_sql(id_expr: str, salt: str) -> str:
    """DuckDB mirror of :func:`_bucket` — oracles must build their SQL
    here so the two engines cannot drift."""
    salted = "'" + salt + "' || chr(31) || (" + id_expr + ")::VARCHAR"
    return f"{hash32_sql(salted)} % {_BUCKETS}"


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashed id: ``weights`` maps
    split name → fraction (must sum to ~1; default 98/1/1
    train/val/test). Adds ``split_col``; order of ``weights`` fixes the
    bucket layout, so pass the same dict to reproduce a split."""
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be >= 0, got {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1, got {total}")
    b = _bucket(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        edge = int(round(cum * _BUCKETS))
        clause = F.when(b < F.lit(edge), F.lit(name))
        expr = clause if expr is None else expr.when(b < F.lit(edge), F.lit(name))
    # the last split takes the remainder so rounding never drops a row
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, expr)


def split_sql_case(id_expr: str, weights: dict[str, float], salt: str = "split") -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`'s assignment
    for the same (id expression, weights, salt)."""
    b = bucket_sql(id_expr, salt)
    names = list(weights)
    arms = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        arms.append(f"WHEN {b} < {int(round(cum * _BUCKETS))} THEN '{name}'")
    body = "\n".join(arms)
    return f"CASE {body} ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | float,
    strata_col: str | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic downsample: keep each row iff its hash bucket falls
    under its stratum's fraction. ``fractions`` is either one float
    (uniform) or a dict stratum-value → fraction with ``strata_col``
    naming the stratum column (strata absent from the dict are DROPPED —
    explicit is better than a silent 1.0). Reproducible on any engine
    and partitioning; sampling twice with the same salt gives a nested
    subset, with different salts an independent one."""
    b = _bucket(F.col(id_col), salt)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("strata_col is required when fractions is a dict")
        if not fractions:
            raise ValueError("fractions must be non-empty")
        for k, f in fractions.items():
            if not 0.0 <= f <= 1.0:
                raise ValueError(f"fraction for {k!r} must be in [0, 1], got {f}")
        edge = None
        for k, f in fractions.items():
            clause = (F.col(strata_col) == F.lit(k), F.lit(int(round(f * _BUCKETS))))
            edge = F.when(*clause) if edge is None else edge.when(*clause)
        edge = edge.otherwise(F.lit(0))
    else:
        if not 0.0 <= fractions <= 1.0:
            raise ValueError(f"fraction must be in [0, 1], got {fractions}")
        edge = F.lit(int(round(fractions * _BUCKETS)))
    return df.filter(b < edge)


def sample_sql_predicate(
    id_expr: str, fraction: float, salt: str = "sample"
) -> str:
    """DuckDB predicate mirroring the uniform :func:`stratified_sample`."""
    return f"{bucket_sql(id_expr, salt)} < {int(round(fraction * _BUCKETS))}"


# ---------------------------------------------------------------------------
# corpus mixture
# ---------------------------------------------------------------------------


def mixture_fractions(
    available: dict[str, float],
    weights: dict[str, float],
) -> dict[str, float]:
    """Per-source keep-fractions realizing a target mixture by DOWN-
    sampling only (no source is upsampled/repeated). ``available`` maps
    source → its token (or row) count; ``weights`` maps source → target
    mixture share. The binding source is the one whose availability is
    smallest relative to its target share — it is kept whole and every
    other source is scaled to match, so the output follows ``weights``
    exactly at the maximum total size down-sampling permits."""
    if set(available) != set(weights):
        raise ValueError(
            f"available and weights must cover the same sources; "
            f"got {sorted(available)} vs {sorted(weights)}"
        )
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {s!r} must be > 0, got {w}")
        if available[s] <= 0:
            raise ValueError(f"available for {s!r} must be > 0, got {available[s]}")
    total_w = sum(weights.values())
    # total output size T satisfies: for every source, T * w_s/total_w
    # <= available_s; the max feasible T is set by the binding source
    t = min(available[s] / (weights[s] / total_w) for s in weights)
    return {
        s: min(1.0, (t * weights[s] / total_w) / available[s]) for s in weights
    }


def mix_corpora(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    id_col: str,
    weigh_by: str | None = None,
    salt: str = "mixture",
    source_col: str = "source",
) -> DataFrame:
    """Compose a training mixture from named sources: measure each
    source's size (rows, or the sum of ``weigh_by`` — e.g. a token-count
    column), derive down-sampling fractions realizing ``weights``
    (:func:`mixture_fractions`), apply the deterministic hash sample per
    source, and union with a ``source_col`` provenance column.

    Deterministic end-to-end: the same sources/weights/salt give the
    same mixture on any cluster, and because per-source sampling uses
    the nested-subset hash rule, RAISING a source's weight later only
    ADDS rows from it — existing membership never churns.

    One aggregation action per source to measure sizes (tiny), then one
    lazy union — the mixture is a plan, not a materialization."""
    if set(sources) != set(weights):
        raise ValueError(
            f"sources and weights must cover the same names; "
            f"got {sorted(sources)} vs {sorted(weights)}"
        )
    if not sources:
        raise ValueError("sources must be non-empty")
    sizes = {}
    for name, df in sources.items():
        agg = (
            df.agg(F.sum(weigh_by).alias("n"))
            if weigh_by is not None
            else df.agg(F.count(F.lit(1)).alias("n"))
        )
        row = agg.first()
        sizes[name] = float(row["n"] or 0.0)
    fracs = mixture_fractions(sizes, weights)
    out = None
    for name, df in sources.items():
        part = stratified_sample(
            df, id_col, fracs[name], salt=f"{salt}:{name}"
        ).withColumn(source_col, F.lit(name))
        out = part if out is None else out.unionByName(part)
    return out


def cap_per_group(
    df: DataFrame,
    group_col: "str | Sequence[str]",
    id_col: str,
    n: int,
    salt: str = "cap",
    prefer: Column | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per group — the per-domain frequency cap
    of web-corpus curation (C4 caps pages per host; Gopher/RefinedWeb
    cap documents per domain so boilerplate-heavy sites cannot dominate
    the mixture). Engine-native extension; the reference's only limit is
    the global dev-mode head (posts-from-hashtags.js:283).

    Which ``n`` survive is deterministic and partitioning-independent:
    rows are ranked inside each group by (hash32(salt ⊕ id), id) — an
    unbiased pseudorandom preference that never flips when the cluster
    layout changes (``rand(seed)`` would). Pass ``prefer`` (e.g. a
    quality score, descending) to keep the BEST ``n`` instead of a
    uniform ``n``; the hashed id stays as the tie-break so equal-quality
    rows still cap deterministically.

    The guarantee requires ``id_col`` to be UNIQUE within a group (the
    same contract every keyed operator here assumes): duplicate ids —
    including multiple NULL ids — tie on both sort keys, and
    ``row_number`` then picks an arbitrary physical row, so which COPY
    survives can vary with layout even though the surviving id set does
    not. Run ``exact_dedup``/``dedup_latest`` first if ids can repeat.

    Scale shape (100 TB): one shuffle on the group key, then a
    rank-and-filter window. The hot groups a cap exists FOR are exactly
    the skewed keys — but the window never materializes a group in
    memory (rank is a streaming pass over the sorted partition), so a
    100M-row domain costs sort spill, not OOM. When only the survivors
    are needed downstream, the filter on row_number ≤ n composes with
    Spark's WindowGroupLimit pushdown (rank-based filters prune inside
    the sort), keeping the shuffle's output O(n · groups).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    order = [_bucket(F.col(id_col), salt).asc(), F.col(id_col).asc()]
    if prefer is not None:
        order = [prefer, *order]
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def cap_rank_sql(id_expr: str, group_expr: str, salt: str = "cap") -> str:
    """DuckDB ``row_number()`` expression mirroring the uniform (no
    ``prefer``) ranking of :func:`cap_per_group` — oracles build their
    rank here so the two engines cannot drift."""
    # NULLS FIRST spelled out: Spark's asc() sorts nulls first while
    # DuckDB defaults to NULLS LAST — a null id (null bucket, by the
    # _bucket contract) must rank identically on both engines
    return (
        f"row_number() OVER (PARTITION BY {group_expr} "
        f"ORDER BY {bucket_sql(id_expr, salt)} NULLS FIRST, {id_expr} NULLS FIRST)"
    )


# ---------------------------------------------------------------------------
# weighted repeat (upsampling) and deterministic shuffle order
# ---------------------------------------------------------------------------


def repeat_by_weight(
    df: DataFrame,
    id_col: str,
    multiplier: "float | dict[str, float]",
    strata_col: str | None = None,
    salt: str = "repeat",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic fractional repetition — the UPSAMPLING half of
    corpus mixing (mix_corpora deliberately only downsamples; multi-epoch
    recipes repeat high-quality sources 2-3×). Each row is emitted
    ``floor(m)`` times, plus once more iff its hash bucket falls under
    ``frac(m)`` — so realized counts hit the target in expectation AND
    are a pure function of (id, salt): re-runs, different partitionings,
    and different engines produce the SAME copy set, and a per-row
    ``copy_col`` (1..copies) keeps downstream keys unique.

    ``multiplier`` ≥ 0; values < 1 degrade to deterministic downsampling
    (consistent with stratified_sample). A dict maps ``strata_col``
    values → multipliers; strata absent from the dict keep m = 1.0.

    Scale: a per-row projection + explode inside the scan stage — no
    shuffle; output size is Σ m_s·n_s by construction.
    """

    def copies_for(m: float) -> Column:
        if m < 0:
            raise ValueError(f"multiplier must be >= 0, got {m}")
        whole = int(m)
        frac_edge = int(round((m - whole) * _BUCKETS))
        return F.lit(whole) + (
            _bucket(F.col(id_col), salt) < F.lit(frac_edge)
        ).cast("int")

    if isinstance(multiplier, dict):
        if strata_col is None:
            raise ValueError("strata_col is required when multiplier is a dict")
        expr = None
        for k, m in multiplier.items():
            clause = (F.col(strata_col) == F.lit(k), copies_for(m))
            expr = F.when(*clause) if expr is None else expr.when(*clause)
        copies: Column = expr.otherwise(F.lit(1)) if expr is not None else F.lit(1)
    else:
        copies = copies_for(multiplier)

    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies")
    )


def repeat_sql_copies(
    id_expr: str, multiplier: float, salt: str = "repeat"
) -> str:
    """DuckDB expression mirroring :func:`repeat_by_weight`'s per-row
    copy count (replay the explode with
    ``CROSS JOIN generate_series(1, copies)``)."""
    whole = int(multiplier)
    frac_edge = int(round((multiplier - whole) * _BUCKETS))
    return (
        f"({whole} + CASE WHEN {bucket_sql(id_expr, salt)} < {frac_edge} "
        "THEN 1 ELSE 0 END)"
    )


def shuffle_key(id_col: Column, salt: str = "shuffle") -> Column:
    """Deterministic pseudo-random global sort key: (hash bucket, id).
    ``df.repartitionByRange(n, key).sortWithinPartitions(key)`` writes a
    corpus in reproducible shuffled order with NO single-task bottleneck
    — the scale-correct way to fix a training order. The order is a pure
    function of (id, salt): stable under corpus growth (new rows
    interleave, existing relative order never flips) and across engines;
    a different salt is an independent permutation."""
    return F.struct(
        _bucket(id_col, salt).alias("b"), id_col.alias("i")
    )


def shuffle_rank(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    salt: str = "shuffle",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Materialized per-stratum rank in :func:`shuffle_key` order (a
    window per stratum — parallel over strata; for a TOTAL corpus rank
    at 100 TB prefer writing in shuffle_key order instead of computing a
    global dense rank)."""
    w = Window.partitionBy(strata_col).orderBy(
        _bucket(F.col(id_col), salt), F.col(id_col)
    )
    return df.withColumn(rank_col, F.row_number().over(w))


def temperature_weights(
    available: dict[str, float], alpha: float = 0.3
) -> dict[str, float]:
    """Temperature-based mixture reweighting (the multilingual-corpus
    balancing rule, Conneau & Lample 2019 / mT5: sample source i with
    probability ∝ nᵢ^α). ``alpha=1`` reproduces natural proportions,
    ``alpha=0`` uniform; the usual 0.2–0.5 range lifts low-resource
    sources without letting any dominate. Returns normalized weights
    ready for :func:`mixture_fractions` / :func:`mix_corpora` — driver
    math over O(sources) floats, deterministic by construction."""
    if not available:
        raise ValueError("available must be non-empty")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    for s, n in available.items():
        if n <= 0:
            raise ValueError(f"available for {s!r} must be > 0, got {n}")
    raw = {s: float(n) ** alpha for s, n in available.items()}
    total = sum(raw.values())
    return {s: v / total for s, v in raw.items()}


def pps_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "pps",
) -> DataFrame:
    """Systematic PPS sampling (probability-proportional-to-size
    WITHOUT replacement — Madow 1949, the survey-sampling workhorse):
    lay the rows along a line in units of their integer weights, in the
    deterministic hash-shuffled order hash32(salt, id), and take every
    (W/n)-th point of the line. Returns the input rows plus
    ``n_copies`` ≥ 1 — how many grid points landed inside the row's
    weight interval (a row with w > W/n is hit multiple times; callers
    wanting strict without-replacement semantics treat n_copies as
    membership, callers building mixtures use it as a repeat count).
    Σ n_copies == n EXACTLY, every row's inclusion count is within ±1
    of n·w/W, and the whole selection is pure int64 —

        pick(i) = floor(cum_i · n / W) − floor(cum_{i−1} · n / W)

    — so the sample is bit-identical under any partitioning or engine
    (:func:`pps_sample_sql`). The corpus-curation use: draw a fixed
    token/byte budget from a weighted pool (quality scores, source
    priors) reproducibly, without the float-comparison boundary drift
    an exponential-keys (A-ES) sample would inherit from libm.

    Scale shape: the global cumulative sum never funnels rows through
    one partition — the hash order's high bits bucket the line, a tiny
    per-bucket count frame cumsums into broadcast offsets, and the
    within-bucket window does the rest (the sorted-neighborhood rank
    pattern). Validated: weights must be positive ints with
    W·n < 2^63, and ids must be non-NULL (both rejected loudly, in
    BOTH engines — the SQL mirror raises via an assert CTE — because
    silently dropping a NULL-id row would shrink the frame and W on
    one engine only)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    rows = df.withColumn(
        "__w", F.col(weight_col).cast("long")
    ).withColumn(
        "__hk",
        hash32(
            F.concat(
                F.lit(salt), F.lit("\x1f"), F.col(id_col).cast("string")
            )
        ),
    )
    bad = rows.agg(
        F.sum(F.when(F.col("__w").isNull() | (F.col("__w") <= 0), 1).otherwise(0)).alias("bad"),
        F.sum(F.when(F.col("__hk").isNull(), 1).otherwise(0)).alias("bad_id"),
        F.coalesce(F.sum("__w"), F.lit(0)).alias("W"),
    ).collect()[0]
    if bad["bad"]:
        raise ValueError(
            f"pps_sample: {bad['bad']} row(s) have NULL or non-positive "
            f"{weight_col!r} — weights must be positive integers"
        )
    if bad["bad_id"]:
        # reject loudly rather than silently drop: a dropped NULL-id
        # row would shrink the sampling frame AND exclude its weight
        # from W while the SQL mirror kept it — a silent cross-engine
        # divergence (the mirror raises identically via its assert CTE)
        raise ValueError(
            f"pps_sample: {bad['bad_id']} row(s) have NULL {id_col!r} — "
            f"ids must be non-NULL (they key the deterministic hash order)"
        )
    total_w = int(bad["W"])
    if total_w == 0:
        return df.withColumn("n_copies", F.lit(0).cast("long")).limit(0)
    if total_w * n >= 2**63:
        raise ValueError(
            f"pps_sample: W·n = {total_w}·{n} overflows int64 — rescale weights"
        )
    # global cumulative weight along (hash, id): bucket by the hash's
    # high bits (monotone in the sort key), offset by the broadcast
    # exclusive prefix sum of per-bucket totals
    rows = rows.withColumn("__bkt", (F.col("__hk") / F.lit(2**24)).cast("int"))
    totals = rows.groupBy("__bkt").agg(F.sum("__w").alias("__bw"))
    off_w = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "__bkt", (F.sum("__bw").over(off_w) - F.col("__bw")).alias("__off")
    )
    cum_w = Window.partitionBy("__bkt").orderBy("__hk", id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    picked = (
        rows.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum", F.sum("__w").over(cum_w) + F.col("__off"))
        .withColumn(
            "n_copies",
            F.expr(f"(__cum * {n}) div {total_w}")
            - F.expr(f"((__cum - __w) * {n}) div {total_w}"),
        )
        .filter(F.col("n_copies") >= 1)
        .drop("__w", "__hk", "__bkt", "__off", "__cum")
    )
    return picked


def pps_sample_sql(
    table_sql: str, id_expr: str, weight_expr: str, n: int, salt: str = "pps"
) -> str:
    """CTE body mirroring :func:`pps_sample` in DuckDB over
    ``table_sql``: ends in ``pps`` with columns (id, n_copies). The
    mirror uses a plain global window (fine at oracle scale); the
    arithmetic is the identical int64 grid walk."""
    hk = hash32_sql(f"'{salt}' || chr(31) || ({id_expr})::VARCHAR")
    return f"""
    pin AS (SELECT ({id_expr}) AS id, ({weight_expr})::BIGINT AS w,
                   {hk} AS hk
            FROM ({table_sql})),
    ptot AS (SELECT CASE WHEN count(*) FILTER (hk IS NULL) > 0
                         THEN error('pps_sample: NULL id in sampling frame')
                         ELSE (sum(w))::BIGINT END AS W
             FROM pin),
    pcum AS (SELECT id, w,
                    (sum(w) OVER (ORDER BY hk, id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
                    AS cum
             FROM pin),
    pps AS (SELECT id,
                   ((cum * {int(n)}) // (SELECT W FROM ptot)
                    - ((cum - w) * {int(n)}) // (SELECT W FROM ptot))::BIGINT
                   AS n_copies
            FROM pcum
            WHERE (cum * {int(n)}) // (SELECT W FROM ptot)
                  > ((cum - w) * {int(n)}) // (SELECT W FROM ptot))
    """
