"""Mergeable distinct-count sketches (HyperLogLog) with CROSS-ENGINE
exact register state.

Why in this engine: distinct counting is the 100 TB profiling staple
(users per event type, domains per shard, vocab per language), and the
mergeable-sketch shape — tiny register state that unions by ``max`` —
is what makes it maintainable continuously instead of recounted from
history. Spark's built-in ``approx_count_distinct`` is a fine black
box, but its register layout is engine-private: no oracle can check
it, and no second system can merge with it. This module builds HLL
(Flajolet et al., AofA 2007) from the repo's engine-neutral md5 hash
kernel so that every register, and the estimate derived from them, is
REPLAYABLE in DuckDB bit-for-bit (the hash32_sql convention).

Exactness design (the same discipline as clustering.py's integer
micro-unit sums):

- the value hash is the first 15 hex chars of md5 → a 60-bit integer,
  identical in Spark (``conv(substr(md5(x),1,15),16,10)``) and DuckDB
  (``('0x'||substr(md5(x),1,15))::BIGINT``);
- bucket = top ``b`` bits, rest = low ``60-b`` bits; the rank
  ``rho`` = leading-zeros(rest)+1 is computed as a SUM of integer
  comparisons ``rest >= 2^k`` (pure codegen, no floats, no log2 —
  floating log2 is off-by-one-ulp exactly at powers of two);
- registers merge by ``max`` (idempotent + commutative + associative:
  replay-safe and batch-split-independent BY ALGEBRA — the property
  the streaming face leans on);
- the harmonic sum is kept EXACT: ``sum_scaled = Σ 2^(S − r)`` over
  all m buckets with S = 61 − b, an int64 (bounded by m·2^(61-b) =
  2^61 for any b) — absent buckets contribute 2^S each, added as
  ``(m − buckets_hit)·2^S`` without materializing a bucket spine;
- the raw HLL estimate is ONE double division of that exact integer:
  E = alpha_m·m²·2^S / sum_scaled (the constant is folded to a single
  Python float interpolated into both engines) — so even the float
  output is deterministic and engine-identical. No small/large-range
  corrections inside the certified value (they need ``ln``, whose
  last-ulp behavior is libm-specific); ``hll_estimate_corrected``
  applies linear counting driver-side for callers who want accuracy
  at tiny cardinalities over replayability.

Standard error is the usual 1.04/√m (m = 2^b = 4096 at the default
b=12 → ~1.6 %).

Reference lineage: no sketch surface exists in the reference (its only
cardinality logic is exact key-existence checks); this is an
engine-native scale extension (SURVEY §7), sibling to the exact
Misra-Gries heavy hitters in operators/frequency.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_HASH_BITS = 60  # 15 md5 hex chars; fits int64 with headroom
HLL_B = 12          # default bucket bits: m=4096, ~1.6 % std error


def _alpha(m: int) -> float:
    """HLL bias constant for m ≥ 128 registers (AofA'07, fig. 3)."""
    if m < 128:
        raise ValueError(f"b too small: need m >= 128 registers, got {m}")
    return 0.7213 / (1 + 1.079 / m)


def hll_hash60(col: Column) -> Column:
    """60-bit engine-neutral value hash (md5 prefix, like text.hash32
    but 15 hex chars). NULL values hash to NULL and drop out of the
    sketch — matching COUNT(DISTINCT)'s NULL semantics."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_hash60_sql(expr: str) -> str:
    """DuckDB mirror of :func:`hll_hash60`."""
    return f"('0x' || substr(md5(({expr})::VARCHAR), 1, 15))::BIGINT"


def _rho_from_rest(rest: Column, rest_bits: int) -> Column:
    """rho = leading-zeros(rest within rest_bits) + 1, as an integer
    comparison sum: bitlen(rest) = Σ_k [rest >= 2^k], rho = rest_bits +
    1 − bitlen. All int64 comparisons — stays in whole-stage codegen."""
    bitlen = None
    for k in range(rest_bits):
        term = (rest >= F.lit(1 << k)).cast("int")
        bitlen = term if bitlen is None else bitlen + term
    return (F.lit(rest_bits + 1) - bitlen).cast("int")


def rho_sql(rest_expr: str, rest_bits: int) -> str:
    """DuckDB mirror of :func:`_rho_from_rest` — generated from the
    same loop so the two engines cannot drift."""
    terms = " + ".join(
        f"CASE WHEN ({rest_expr}) >= {1 << k} THEN 1 ELSE 0 END"
        for k in range(rest_bits)
    )
    return f"({rest_bits + 1} - ({terms}))"


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = HLL_B,
) -> DataFrame:
    """Per-group HLL register state: (group…, bucket, r) with r the max
    rank observed in that bucket — at most m=2^b rows per group, the
    mergeable summary (union two register sets with groupBy-max and the
    estimate is the estimate of the union, exactly).

    Scale: one scan computing (bucket, rho) as codegen expressions, one
    partially-aggregated groupBy — the shuffle moves ≤ groups·m rows
    regardless of input size."""
    if not (7 <= b <= 16):
        raise ValueError(f"b must be in [7, 16], got {b}")
    rest_bits = HLL_HASH_BITS - b
    g = list(group_cols or [])
    h = hll_hash60(F.col(value_col))
    bucket = F.shiftright(h, rest_bits).cast("int").alias("bucket")
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*g, bucket, _rho_from_rest(rest, rest_bits).alias("r"))
        .groupBy(*g, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate_expr(b: int = HLL_B) -> tuple[Column, Column, Column]:
    """The aggregate columns turning register rows into the certified
    summary — (buckets_hit, sum_scaled, hll_estimate) — for use after a
    groupBy over :func:`hll_registers` output. ``sum_scaled`` is the
    EXACT integer Σ 2^(S−r) including every absent bucket's 2^S."""
    m = 1 << b
    s = HLL_HASH_BITS - b + 1  # max rho; 2^(S - r) exponent in [0, S]
    hit = F.count(F.lit(1))
    # shiftleft's numBits arg is Column-hostile in the Python API — SQL text
    present = F.sum(F.expr(f"shiftleft(cast(1 as bigint), {s} - r)"))
    sum_scaled = (
        present + (F.lit(m).cast("long") - hit) * F.lit(1 << s).cast("long")
    ).cast("long")
    const = _alpha(m) * m * m * float(1 << s)  # one folded double literal
    est = F.round(F.lit(const) / sum_scaled.cast("double"), 4)
    return (
        hit.cast("long").alias("buckets_hit"),
        sum_scaled.alias("sum_scaled"),
        est.alias("hll_estimate"),
    )


def hll_summary(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = HLL_B,
) -> DataFrame:
    """Approximate distinct ``value_col`` per group: (group…,
    buckets_hit, sum_scaled, hll_estimate). ``sum_scaled`` is bit-exact
    cross-engine; ``hll_estimate`` is the raw HLL estimate (no
    small-range correction — see the module docstring) derived from it
    by one deterministic double division."""
    g = list(group_cols or [])
    regs = hll_registers(df, value_col, g, b)
    hit, sum_scaled, est = hll_estimate_expr(b)
    out = regs.groupBy(*g).agg(hit, sum_scaled, est)
    return out


def hll_summary_sql(
    value_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    b: int = HLL_B,
    where: str | None = None,
) -> str:
    """Standalone DuckDB statement mirroring :func:`hll_summary` —
    identical hash, rho chain, exact integer sum, and the same folded
    estimate constant, so every column value-matches the Spark side."""
    m = 1 << b
    s = HLL_HASH_BITS - b + 1
    rest_bits = HLL_HASH_BITS - b
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    gby = ("GROUP BY " + ", ".join(g)) if g else ""
    const = repr(_alpha(m) * m * m * float(1 << s))
    h = hll_hash60_sql(value_expr)
    wh = f"AND ({where})" if where else ""
    rho = rho_sql("rest", rest_bits)
    return f"""
    WITH hashed AS (
      SELECT {gsel}({h} >> {rest_bits})::INT AS bucket,
             ({h} & {(1 << rest_bits) - 1}) AS rest
      FROM {from_clause}
      WHERE ({value_expr}) IS NOT NULL {wh}),
    regs AS (
      SELECT {gsel}bucket, max({rho})::INT AS r
      FROM hashed GROUP BY {gsel}bucket),
    summ AS (
      SELECT {gsel}count(*)::BIGINT AS buckets_hit,
             (sum((1::BIGINT << ({s} - r)))
              + ({m}::BIGINT - count(*)) * {1 << s}::BIGINT)::BIGINT
               AS sum_scaled
      FROM regs {gby})
    SELECT {gsel}buckets_hit, sum_scaled,
           round({const} / sum_scaled::DOUBLE, 4) AS hll_estimate
    FROM summ
    """


def hll_merge(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge register sets (e.g. per-shard or per-epoch sketches) into
    one: groupBy-max over (group…, bucket). Max is idempotent,
    commutative, associative — merging is replay-safe and
    split-independent by algebra, which is exactly why the streaming
    face stores registers, not estimates."""
    g = list(group_cols or [])
    return registers.groupBy(*g, "bucket").agg(F.max("r").alias("r"))


def hll_estimate_corrected(
    buckets_hit: int, sum_scaled: int, b: int = HLL_B
) -> float:
    """Driver-side small-range correction (linear counting when the raw
    estimate < 2.5·m and empty buckets exist — AofA'07 fig. 3). Uses
    ``ln``, so it is NOT part of the cross-engine-certified columns;
    apply it to the certified integers when accuracy at tiny
    cardinalities matters more than replayability."""
    import math

    m = 1 << b
    s = HLL_HASH_BITS - b + 1
    raw = _alpha(m) * m * m * float(1 << s) / sum_scaled
    zeros = m - buckets_hit
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable point-FREQUENCY estimates (Cormode &
# Muthukrishnan, J. Algorithms 2005) — the counting sibling of the HLL
# distinct sketch above. d hash rows × w counters of pure int64 sums:
# est(x) = min_j counter[j][h_j(x)] ≥ true(x), and ≤ true(x) + εN with
# probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Counters merge by SUM
# (sketch of a union = sum of sketches — mergeable by algebra, but NOT
# idempotent, so the continuous face must be epoch-keyed like the
# rollup/k-means stores, unlike HLL's max-merge). Hashes ride the
# engine-neutral hash32 kernel, so registers, merges, and estimates all
# replay in DuckDB bit-for-bit. Where the exact Misra-Gries heavy
# hitters (operators/frequency.py) answer "which keys are frequent",
# the CM sketch answers "how often is THIS key" for any key, with
# O(d·w) state per group.
# ---------------------------------------------------------------------------

CM_W = 1024  # default width: ε ≈ e/1024 ≈ 0.27 % of the stream length
CM_D = 4     # default depth: δ = e^-4 ≈ 1.8 %


def cm_hash(col: Column, j: int, w: int) -> Column:
    """Row-j counter index for a value: hash32("cm{j}" ⟂ value) mod w —
    independent rows by salt, NULL values drop (NULL propagates)."""
    from etl_instagram_spark.functions.text import hash32

    return (
        hash32(F.concat(F.lit(f"cm{j}"), F.lit("\x1f"), col.cast("string")))
        % w
    )


def cm_hash_sql(expr: str, j: int, w: int) -> str:
    """DuckDB mirror of :func:`cm_hash`."""
    from etl_instagram_spark.functions.text import hash32_sql

    salted = f"'cm{j}' || chr(31) || ({expr})::VARCHAR"
    return f"({hash32_sql(salted)} % {w})"


def cm_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    w: int = CM_W,
    d: int = CM_D,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group CM register state: (group…, j, col, cnt) — at most d·w
    rows per group, cnt the int64 number of stream items whose row-j
    hash landed in counter ``col``. One explode of d (j, col) pairs per
    row + one partially-aggregated counting groupBy; untouched counters
    are implicit zeros (never materialized).

    ``weight_col`` switches to WEIGHTED counters: each row contributes
    its positive-int64 weight instead of 1, so :func:`cm_lookup`
    answers approximate per-key TOTALS (tokens per domain, spend per
    user) under the same d·w memory bound and the same one-sided
    guarantee (est ≥ true total; the Cormode-Muthukrishnan analysis is
    weight-agnostic — a weight-w item is w unit items to counting
    algebra, the pinned differential). Weights must be positive
    (NULL/zero/negative raise inside the scan — a silently skipped
    weight would desynchronize the engines)."""
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    g = list(group_cols or [])
    v = F.col(value_col)
    if weight_col is None:
        wt = F.lit(1).cast("long")
    else:
        wv = F.col(weight_col).cast("long")
        wt = F.when(
            wv.isNull() | (wv <= 0),
            F.raise_error(
                F.concat(
                    F.lit("cm_sketch: weight must be a positive int64, got "),
                    F.coalesce(wv.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(wv)
    vv = F.col("__v")
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), cm_hash(vv, j, w).alias("col"))
            for j in range(d)
        ]
    )
    return (
        df.filter(v.isNotNull())
        .select(*g, v.alias("__v"), wt.alias("__wt"))
        # pre-collapse to distinct (group, value) with summed weights
        # BEFORE hashing (the r14 dcm_sketch convention): the d md5
        # evaluations run once per DISTINCT value instead of once per
        # row — counting is additive, so the registers are
        # bit-identical, and both collapses are map-side combined
        .groupBy(*g, "__v")
        .agg(F.sum("__wt").cast("long").alias("__wt"))
        .select(*g, "__wt", F.explode(pairs).alias("__p"))
        .select(
            *g,
            "__wt",
            F.col("__p.j").alias("j"),
            F.col("__p.col").alias("col"),
        )
        .groupBy(*g, "j", "col")
        .agg(F.sum("__wt").cast("long").alias("cnt"))
    )


def cm_sketch_sql(
    value_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    w: int = CM_W,
    d: int = CM_D,
    where: str | None = None,
    weight_expr: str | None = None,
) -> str:
    """Standalone DuckDB statement mirroring :func:`cm_sketch` —
    identical salted hashes, identical integer counters, and the same
    loud bad-weight error() when ``weight_expr`` is given."""
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    wh = f"AND ({where})" if where else ""
    if weight_expr is None:
        wsel = "1::BIGINT AS wt"
    else:
        wsel = (
            f"CASE WHEN ({weight_expr}) IS NULL OR ({weight_expr}) <= 0"
            f" THEN error('cm_sketch: weight must be a positive int64')"
            f" ELSE ({weight_expr})::BIGINT END AS wt"
        )
    branches = " UNION ALL ".join(
        f"SELECT {gsel}{wsel}, {j} AS j, {cm_hash_sql(value_expr, j, w)} AS col"
        f" FROM {from_clause}"
        f" WHERE ({value_expr}) IS NOT NULL {wh}"
        for j in range(d)
    )
    return f"""
    SELECT {gsel}j, col, (sum(wt))::BIGINT AS cnt
    FROM ({branches}) cmrows
    GROUP BY {gsel}j, col
    """


def cm_merge(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge CM register sets (per-shard / per-epoch) into one:
    groupBy-SUM over (group…, j, col). Sum is commutative/associative —
    split-independent — but NOT idempotent: never merge the same
    batch's registers twice (the continuous face keys by epoch for
    exactly this reason)."""
    g = list(group_cols or [])
    return registers.groupBy(*g, "j", "col").agg(F.sum("cnt").alias("cnt"))


def cm_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    w: int = CM_W,
    d: int = CM_D,
) -> DataFrame:
    """Point-frequency estimates: for every (group…, value) row of
    ``queries``, est = min over the d counters the value hashes to —
    ≥ the true count always (counters only over-count), exact when no
    other key collided on some row. Missing counters read as 0. One
    explode + one key-equi LEFT join + one min-groupBy; the sketch side
    is tiny (≤ d·w rows per group)."""
    g = list(group_cols or [])
    v = F.col(value_col)
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), cm_hash(v, j, w).alias("col"))
            for j in range(d)
        ]
    )
    expanded = (
        queries.filter(v.isNotNull())
        .select(*g, value_col, F.explode(pairs).alias("__p"))
        .select(
            *g,
            value_col,
            F.col("__p.j").alias("j"),
            F.col("__p.col").alias("col"),
        )
    )
    return (
        expanded.join(sketch, [*g, "j", "col"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(*g, value_col)
        .agg(F.min("cnt").cast("long").alias("cm_estimate"))
    )


def cm_lookup_sql(
    sketch_sql: str,
    queries_sql: str,
    value_expr: str = "value",
    group_exprs: list[str] | None = None,
    w: int = CM_W,
    d: int = CM_D,
) -> str:
    """DuckDB mirror of :func:`cm_lookup`: ``sketch_sql`` produces the
    register rows, ``queries_sql`` the (group…, value) probes; output
    (group…, value, cm_estimate)."""
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    gjoin = " AND ".join([f"s.{e} = q.{e}" for e in g] + ["s.j = q.j", "s.col = q.col"])
    branches = " UNION ALL ".join(
        f"SELECT {gsel}{value_expr} AS value, {j} AS j,"
        f" {cm_hash_sql(value_expr, j, w)} AS col"
        f" FROM ({queries_sql}) WHERE ({value_expr}) IS NOT NULL"
        for j in range(d)
    )
    qg = "".join(f"q.{e}, " for e in g)
    return f"""
    SELECT {qg}q.value, (min(COALESCE(s.cnt, 0)))::BIGINT AS cm_estimate
    FROM ({branches}) q
    LEFT JOIN ({sketch_sql}) s ON {gjoin}
    GROUP BY {qg}q.value
    """


# ---------------------------------------------------------------------------
# Dyadic count-min QUANTILE sketch (Cormode & Muthukrishnan, J. Algorithms
# 2005 §4.2: range sums / quantiles by dyadic decomposition over CM rows).
#
# Why this shape and not KLL/t-digest: KLL's compactor is SEQUENTIAL — which
# items survive depends on arrival order within a buffer, so two engines (or
# two partitionings) produce different, equally-valid states; t-digest
# centroids are float means. Neither can be certified bit-for-bit across
# engines. The dyadic-CM construction is pure COUNTING: one CM sketch per
# dyadic level ℓ counting the keys (value >> ℓ); registers merge by SUM
# (commutative/associative — batch-split-independent BY ALGEBRA, the same
# property the epoch-keyed continuous faces lean on), every register is an
# int64, and both the rank estimate and the quantile bit-descent are integer
# arithmetic a DuckDB CTE chain replays exactly.
#
# Guarantees: counters only over-count, so rank_est(x) ≥ true rank(x)
# always, with E[overcount] ≤ (b·e/w)·n per probe (union over ≤ b dyadic
# nodes, each a CM row of width w); quantile answers are exact order
# statistics whenever no collision lands on the probed nodes. State is
# ≤ d·w·b rows per group regardless of input size.
#
# Values must be integers in [0, 2^b): quantize continuous columns onto a
# fixed grid first (e.g. cents = floor(value·100) — IEEE double multiply
# and floor are bit-identical across engines; only libm pow/ln are not).
# Out-of-range values fail LOUDLY in both engines (raise_error / error()),
# never silently alias; NULLs drop, matching percentile semantics.
# ---------------------------------------------------------------------------

DCM_W = 512  # counters per (level, row): rank overcount ~ (b·e/w)·n
DCM_D = 3    # independent rows per level
DCM_B = 16   # domain bits: values in [0, 65536)


def dcm_hash(prefix: Column, lvl: Column, j: Column, w: int) -> Column:
    """Counter index for a dyadic node: hash32("dq{lvl}.{j}" ⟂ prefix)
    mod w — the salt is built from COLUMNS so sketch, rank, and the
    quantile descent share one expression in both engines."""
    from etl_instagram_spark.functions.text import hash32

    return (
        hash32(
            F.concat(
                F.lit("dq"),
                lvl.cast("string"),
                F.lit("."),
                j.cast("string"),
                F.lit("\x1f"),
                prefix.cast("string"),
            )
        )
        % w
    )


def dcm_hash_sql(prefix_expr: str, lvl_expr: str, j_expr: str, w: int) -> str:
    """DuckDB mirror of :func:`dcm_hash`."""
    from etl_instagram_spark.functions.text import hash32_sql

    salted = (
        f"'dq' || ({lvl_expr})::VARCHAR || '.' || ({j_expr})::VARCHAR"
        f" || chr(31) || ({prefix_expr})::VARCHAR"
    )
    return f"({hash32_sql(salted)} % {w})"


def dcm_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    w: int = DCM_W,
    d: int = DCM_D,
    b: int = DCM_B,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group dyadic-CM register state: (group…, lvl, j, col, cnt) —
    at most d·w·b rows per group; level-ℓ rows count the dyadic keys
    (value >> ℓ). One b·d explode + one partially-aggregated counting
    groupBy; the shuffle moves ≤ groups·d·w·b rows regardless of input
    size. Out-of-range values raise INSIDE the scan (no extra
    validation pass — the loud-assert convention).

    ``weight_col`` switches to WEIGHTED registers: each row contributes
    its positive-int64 weight instead of 1, so every downstream face —
    rank, quantiles, driver descent, merge, SQL replay — answers
    weighted ranks/quantiles with no change (the descent is pure
    counting algebra; a weight-w row is indistinguishable from w
    unit rows, which is exactly the pinned differential). The
    token-weighted percentile use: "the doc-length value below which
    half the CORPUS TOKENS sit", not half the documents. Weights must
    be positive (NULL/zero/negative raise inside the scan — a silently
    skipped weight would desynchronize the engines)."""
    if not (2 <= b <= 40):
        raise ValueError(f"b must be in [2, 40], got {b}")
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    g = list(group_cols or [])
    v = F.col(value_col).cast("long")
    guarded = F.when(
        (v < 0) | (v >= F.lit(1 << b)),
        F.raise_error(
            F.concat(
                F.lit(f"dcm_sketch: value out of [0, {1 << b}): "),
                v.cast("string"),
            )
        ).cast("long"),
    ).otherwise(v)
    if weight_col is None:
        wt = F.lit(1).cast("long")
    else:
        wv = F.col(weight_col).cast("long")
        wt = F.when(
            wv.isNull() | (wv <= 0),
            F.raise_error(
                F.concat(
                    F.lit("dcm_sketch: weight must be a positive int64, got "),
                    F.coalesce(wv.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(wv)
    levels = F.array(*[F.lit(lv) for lv in range(b)])
    rows = F.array(*[F.lit(j) for j in range(d)])
    return (
        df.filter(v.isNotNull())
        .select(*g, guarded.alias("__v"), wt.alias("__wt"))
        # two domain-bounded collapses BEFORE any md5 is computed (r14):
        # (1) distinct (group, value) with summed weights, then
        # (2) distinct (group, lvl, value>>lvl) dyadic prefixes — the
        # prefix domain HALVES per level, so hash work drops from
        # rows·d·b evaluations to ~2·distinct(value)·d regardless of
        # input size. Counting is additive, so the registers are
        # bit-identical to the naive explode.
        .groupBy(*g, "__v")
        .agg(F.sum("__wt").cast("long").alias("__wt"))
        .select(*g, "__v", "__wt", F.explode(levels).alias("lvl"))
        .select(
            *g, "__wt", "lvl", F.expr("shiftright(__v, lvl)").alias("__pref")
        )
        .groupBy(*g, "lvl", "__pref")
        .agg(F.sum("__wt").cast("long").alias("__wt"))
        .select(*g, "__wt", "lvl", "__pref", F.explode(rows).alias("j"))
        .select(
            *g,
            "__wt",
            "lvl",
            "j",
            dcm_hash(F.col("__pref"), F.col("lvl"), F.col("j"), w).alias(
                "col"
            ),
        )
        .groupBy(*g, "lvl", "j", "col")
        .agg(F.sum("__wt").cast("long").alias("cnt"))
    )


def dcm_sketch_sql(
    value_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    w: int = DCM_W,
    d: int = DCM_D,
    b: int = DCM_B,
    where: str | None = None,
    weight_expr: str | None = None,
) -> str:
    """Standalone DuckDB statement mirroring :func:`dcm_sketch` —
    identical dynamic-salt hashes, identical integer counters, and the
    same loud out-of-range / bad-weight error()s."""
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    wh = f"AND ({where})" if where else ""
    guard = (
        f"CASE WHEN ({value_expr}) < 0 OR ({value_expr}) >= {1 << b}"
        f" THEN error('dcm_sketch: value out of range')"
        f" ELSE ({value_expr})::BIGINT END"
    )
    if weight_expr is None:
        wsel, agg = "1::BIGINT AS wt", "sum(wt)"
    else:
        wsel = (
            f"CASE WHEN ({weight_expr}) IS NULL OR ({weight_expr}) <= 0"
            f" THEN error('dcm_sketch: weight must be a positive int64')"
            f" ELSE ({weight_expr})::BIGINT END AS wt"
        )
        agg = "sum(wt)"
    col = dcm_hash_sql("(v >> lvl)", "lvl", "j", w)
    return f"""
    SELECT {gsel}lvl, j, {col} AS col, ({agg})::BIGINT AS cnt
    FROM (SELECT {gsel}{guard} AS v, {wsel} FROM {from_clause}
          WHERE ({value_expr}) IS NOT NULL {wh}) src
    CROSS JOIN (SELECT unnest(range({b}))::INT AS lvl) lv
    CROSS JOIN (SELECT unnest(range({d}))::INT AS j) jj
    GROUP BY {gsel}lvl, j, col
    """


def dcm_merge(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge dyadic-CM register sets (per-shard / per-epoch):
    groupBy-SUM over (group…, lvl, j, col). Split-independent but not
    idempotent — the continuous face keys by epoch, exactly like
    :func:`cm_merge`."""
    g = list(group_cols or [])
    return registers.groupBy(*g, "lvl", "j", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def dcm_total(
    sketch: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Exact item count per group, read back out of the sketch: every
    non-NULL item lands in exactly one counter of the (lvl=0, j=0)
    family, so its column sum is n — no side channel to keep in sync."""
    g = list(group_cols or [])
    return (
        sketch.filter((F.col("lvl") == 0) & (F.col("j") == 0))
        .groupBy(*g)
        .agg(F.sum("cnt").cast("long").alias("n"))
    )


def dcm_rank(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    w: int = DCM_W,
    d: int = DCM_D,
    b: int = DCM_B,
) -> DataFrame:
    """Rank estimates: one row per distinct (group…, value) probe with
    ``rank_est`` = estimated #items strictly below the value — the sum
    of CM estimates over the ≤ b dyadic nodes decomposing [0, value),
    each the min over d counters. Always ≥ the true rank (counters only
    over-count). One explode + one key-equi LEFT join against the tiny
    register frame + two groupBys. The register side is construction-
    bounded at groups·d·w·b rows — a model-sized frame by design — so
    the join is an explicit BROADCAST: the probe side never shuffles
    for the join (r14; the auto threshold had been picking sort-merge,
    which priced each of the descent's 16 sequential probes at a full
    shuffle round-trip)."""
    g = list(group_cols or [])
    x = F.col(value_col).cast("long")
    base = probes.filter(x.isNotNull()).select(*g, x.alias("__x")).distinct()
    pairs = F.array(
        *[
            F.struct(F.lit(lv).alias("lvl"), F.lit(j).alias("j"))
            for lv in range(b)
            for j in range(d)
        ]
    )
    ex = (
        base.select(*g, "__x", F.explode(pairs).alias("__p"))
        .select(
            *g,
            "__x",
            F.col("__p.lvl").alias("lvl"),
            F.col("__p.j").alias("j"),
        )
        # level ℓ contributes iff bit ℓ of x is set; its node is the
        # length-2^ℓ dyadic interval ending at x's bit-ℓ boundary
        .filter(F.expr("(shiftright(__x, lvl) & 1) = 1"))
        .withColumn(
            "__pref", F.expr("shiftleft(shiftright(__x, lvl + 1), 1)")
        )
        .withColumn(
            "col", dcm_hash(F.col("__pref"), F.col("lvl"), F.col("j"), w)
        )
    )
    per_node = (
        ex.join(F.broadcast(sketch), [*g, "lvl", "j", "col"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
        .groupBy(*g, "__x", "lvl")
        .agg(F.min("cnt").alias("__est"))
    )
    summed = per_node.groupBy(*g, "__x").agg(
        F.sum("__est").cast("long").alias("rank_est")
    )
    return (
        base.join(summed, [*g, "__x"], "left")
        .withColumn(
            "rank_est", F.coalesce("rank_est", F.lit(0)).cast("long")
        )
        .withColumnRenamed("__x", value_col)
    )


def dcm_quantiles(
    sketch: DataFrame,
    quantiles: list[tuple[int, int]],
    group_cols: list[str] | None = None,
    w: int = DCM_W,
    d: int = DCM_D,
    b: int = DCM_B,
) -> DataFrame:
    """Quantile answers from the registers alone: for each (num, den)
    rational φ, per group, the largest domain value x with
    rank_est(x) < target, target = ceil(φ·n) — the φ-quantile up to the
    sketch's rank error, EXACTLY percentile_disc when no collision
    touches the probed nodes. Output (group…, q_num, q_den, n, target,
    q_value).

    The descent fixes one bit per round, high to low — and because
    every round is pure integer arithmetic against the construction-
    bounded register frame, the whole b-round walk runs as ONE plan
    (r14): registers fold to a per-group map column (≤ d·w·b entries —
    the same model-sized object :func:`dcm_quantiles_driver` collects),
    and a nested higher-order ``aggregate`` expression replays all b
    fix-one-bit rounds per output row in a single job. The prior
    implementation scheduled b sequential probe jobs — ~20 s of pure
    job-launch overhead at ANY scale factor for 20 output rows; this
    shape is two small shuffles + one expression, and the walk stays
    bit-identical (pinned by the DuckDB replay tests and the
    driver-twin equality test). DuckDB CTE chain:
    :func:`dcm_quantiles_sql` replays the identical walk."""
    for nu, de in quantiles:
        if not (0 < nu <= de):
            raise ValueError(f"quantile must satisfy 0 < num <= den: {nu}/{de}")
    g = list(group_cols or [])
    sk = sketch.localCheckpoint(eager=True)  # read twice: total + map
    qlist = F.array(
        *[
            F.struct(
                F.lit(int(nu)).alias("q_num"), F.lit(int(de)).alias("q_den")
            )
            for nu, de in quantiles
        ]
    )
    # per-group register map, keyed "lvl:j:col". min() mirrors the join
    # path's min-over-matches on (illegal) duplicate counter rows; on
    # the unique rows dcm_sketch produces it is the identity.
    regs = (
        sk.groupBy(*g, "lvl", "j", "col")
        .agg(F.min("cnt").alias("cnt"))
        .groupBy(*g)
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.concat_ws(":", "lvl", "j", "col").alias("k"),
                        F.col("cnt").alias("v"),
                    )
                )
            ).alias("__regs")
        )
    )
    base = dcm_total(sk, g)
    joined = base.join(regs, g) if g else base.crossJoin(regs)
    return (
        joined.select(*g, "n", "__regs", F.explode(qlist).alias("__q"))
        .select(
            *g,
            "n",
            "__regs",
            F.col("__q.q_num").alias("q_num"),
            F.col("__q.q_den").alias("q_den"),
        )
        .withColumn("target", F.expr("(q_num * n + q_den - 1) div q_den"))
        .withColumn("q_value", F.expr(_descent_expr(b=b, d=d, w=w)))
        .select(*g, "q_num", "q_den", "n", "target", "q_value")
    )


def _descent_expr(b: int, d: int, w: int) -> str:
    """The b-round bit descent as one nested-HOF SQL expression over
    the ``__regs`` map and ``target`` columns: fold k = b−1 … 0 with
    x ← x + 2^k iff rank_est(x + 2^k) < target, where rank_est is the
    sum over set bits of the min over the d counter rows — the exact
    integer walk :func:`dcm_rank` + the old per-round join loop
    computed, inlined so Catalyst schedules ONE job for all rounds."""
    cand = "(x + shiftleft(cast(1 as bigint), k))"
    pref = f"cast(shiftleft(shiftright({cand}, lv + 1), 1) as string)"

    def counter(j: int) -> str:
        salt = (
            f"concat('dq', cast(lv as string), '.', '{j}', '\x1f', {pref})"
        )
        colh = (
            f"(cast(conv(substring(md5({salt}), 1, 8), 16, 10) as bigint)"
            f" % {w})"
        )
        key = f"concat(cast(lv as string), ':', '{j}', ':', cast({colh} as string))"
        return f"coalesce(element_at(__regs, {key}), cast(0 as bigint))"

    # Spark's least() needs >= 2 args — with d=1 (legal config) the
    # single counter IS the row minimum
    row_min = (
        f"least({', '.join(counter(j) for j in range(d))})"
        if d > 1
        else counter(0)
    )
    rank = (
        f"aggregate("
        f"filter(sequence(0, {b - 1}), lv -> (shiftright({cand}, lv) & 1) = 1), "
        f"cast(0 as bigint), "
        f"(racc, lv) -> racc + {row_min}"
        f")"
    )
    return (
        f"aggregate(sequence({b - 1}, 0, -1), cast(0 as bigint), "
        f"(x, k) -> if({rank} < target, {cand}, x))"
    )


def dcm_quantiles_sql(
    sketch_sql: str,
    quantiles: list[tuple[int, int]],
    group_exprs: list[str] | None = None,
    w: int = DCM_W,
    d: int = DCM_D,
    b: int = DCM_B,
) -> str:
    """WITH-clause body replaying :func:`dcm_quantiles` in DuckDB — the
    registers once (MATERIALIZED), then one CTE per descent round with
    the identical integer rank probe; final CTE ``qout`` has columns
    (group…, q_num, q_den, n, target, q_value)."""
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    qvals = ", ".join(f"({nu}, {de})" for nu, de in quantiles)
    gq = "".join(f"c.{e}, " for e in g)
    parts = [
        f"regs AS MATERIALIZED ({sketch_sql})",
        f"ntot AS (SELECT {gsel}(sum(cnt))::BIGINT AS n FROM regs"
        f" WHERE lvl = 0 AND j = 0"
        + (f" GROUP BY {', '.join(g)}" if g else "")
        + ")",
        f"s0 AS (SELECT {gsel}q.q_num, q.q_den, n,"
        f" ((q.q_num * n + q.q_den - 1) // q.q_den)::BIGINT AS target,"
        f" 0::BIGINT AS x"
        f" FROM ntot CROSS JOIN (VALUES {qvals}) q(q_num, q_den))",
    ]
    for i, k in enumerate(range(b - 1, -1, -1)):
        step = 1 << k
        pref = "((c.cand >> (lv.lvl + 1)) << 1)"
        col = dcm_hash_sql(pref, "lv.lvl", "jj.j", w)
        gjoin = " AND ".join(
            [f"regs.{e} = p.{e}" for e in g]
            + ["regs.lvl = p.lvl", "regs.j = p.j", "regs.col = p.col"]
        )
        parts.append(
            f"c{i} AS (SELECT *, (x + {step})::BIGINT AS cand FROM s{i})"
        )
        parts.append(
            f"p{i} AS (SELECT {gq}c.q_num, c.q_den, c.cand,"
            f" lv.lvl, jj.j, {col} AS col"
            f" FROM c{i} c"
            f" CROSS JOIN (SELECT unnest(range({b}))::INT AS lvl) lv"
            f" CROSS JOIN (SELECT unnest(range({d}))::INT AS j) jj"
            f" WHERE ((c.cand >> lv.lvl) & 1) = 1)"
        )
        pg = "".join(f"p.{e}, " for e in g)
        parts.append(
            f"r{i} AS (SELECT {gsel}q_num, q_den, cand,"
            f" (sum(est))::BIGINT AS rank_est FROM"
            f" (SELECT {pg}p.q_num, p.q_den, p.cand, p.lvl,"
            f"  (min(COALESCE(regs.cnt, 0)))::BIGINT AS est"
            f"  FROM p{i} p LEFT JOIN regs ON {gjoin}"
            f"  GROUP BY {pg}p.q_num, p.q_den, p.cand, p.lvl) node"
            f" GROUP BY {gsel}q_num, q_den, cand)"
        )
        rjoin = " AND ".join(
            [f"r.{e} = c.{e}" for e in g]
            + ["r.q_num = c.q_num", "r.q_den = c.q_den"]
        )
        parts.append(
            f"s{i + 1} AS MATERIALIZED (SELECT {gq}c.q_num, c.q_den, c.n,"
            f" c.target,"
            f" (CASE WHEN COALESCE(r.rank_est, 0) < c.target THEN c.cand"
            f" ELSE c.x END)::BIGINT AS x"
            f" FROM c{i} c LEFT JOIN r{i} r ON {rjoin})"
        )
    parts.append(
        f"qout AS (SELECT {gsel}q_num, q_den, n, target,"
        f" x AS q_value FROM s{b})"
    )
    return ",\n".join(parts)


def _dcm_hash_py(prefix: int, lvl: int, j: int, w: int) -> int:
    """Pure-Python mirror of :func:`dcm_hash`, on the shared
    functions.text.hash32_py kernel mirror."""
    from etl_instagram_spark.functions.text import hash32_py

    return hash32_py(f"dq{lvl}.{j}\x1f{prefix}") % w


def dcm_quantiles_driver(
    sketch: DataFrame,
    quantiles: list[tuple[int, int]],
    group_cols: list[str] | None = None,
    w: int = DCM_W,
    d: int = DCM_D,
    b: int = DCM_B,
    max_collect_rows: int = 2_000_000,
) -> list[dict]:
    """:func:`dcm_quantiles` answered DRIVER-SIDE: collect the register
    frame (bounded at d·w·b rows PER GROUP by construction — a model-
    sized object like k-means centroids, independent of data volume;
    ``max_collect_rows`` rejects a group explosion loudly) and run the
    identical integer bit descent in Python — the walk is pure int64
    arithmetic over the md5 hash32 kernel, so the answers are equal
    row-for-row to the distributed descent (pinned by test). One Spark
    action instead of b sequential probe rounds: this is the LATENCY
    face for per-tick streaming probes (stream_profile_drift); the
    distributed :func:`dcm_quantiles` remains the many-groups batch
    face and the cross-engine-certified one (dcm_quantiles_sql).

    Returns one dict per (group…, quantile): {group cols…, q_num,
    q_den, n, target, q_value} — same fields as dcm_quantiles rows."""
    for nu, de in quantiles:
        if not (0 < nu <= de):
            raise ValueError(f"quantile must satisfy 0 < num <= den: {nu}/{de}")
    g = list(group_cols or [])
    limited = sketch.limit(max_collect_rows + 1).collect()
    if len(limited) > max_collect_rows:
        raise ValueError(
            f"dcm_quantiles_driver: register frame exceeds "
            f"max_collect_rows={max_collect_rows} — too many groups for "
            f"a driver-side descent; use dcm_quantiles"
        )
    counters: dict[tuple, int] = {}
    totals: dict[tuple, int] = {}
    for r in limited:
        key = tuple(r[c] for c in g)
        counters[(key, r["lvl"], r["j"], r["col"])] = (
            counters.get((key, r["lvl"], r["j"], r["col"]), 0) + r["cnt"]
        )
        if r["lvl"] == 0 and r["j"] == 0:
            totals[key] = totals.get(key, 0) + r["cnt"]

    def rank(key: tuple, x: int) -> int:
        # mirror of dcm_rank: for each set bit ℓ of x, the level-ℓ
        # node ending at x's bit boundary, est = min over the d rows
        total = 0
        for lvl in range(b):
            if (x >> lvl) & 1:
                pref = (x >> (lvl + 1)) << 1
                total += min(
                    counters.get(
                        (key, lvl, j, _dcm_hash_py(pref, lvl, j, w)), 0
                    )
                    for j in range(d)
                )
        return total

    out: list[dict] = []
    for key, n in sorted(totals.items()):
        for nu, de in quantiles:
            target = (nu * n + de - 1) // de
            x = 0
            for k in range(b - 1, -1, -1):
                cand = x + (1 << k)
                if rank(key, cand) < target:
                    x = cand
            row = dict(zip(g, key))
            row.update(
                q_num=nu, q_den=de, n=n, target=target, q_value=x
            )
            out.append(row)
    return out
