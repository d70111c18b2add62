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
) -> DataFrame:
    """Per-group CM register state: (group…, j, col, cnt) — at most d·w
    rows per group, cnt the int64 number of stream items whose row-j
    hash landed in counter ``col``. One explode of d (j, col) pairs per
    row + one partially-aggregated counting groupBy; untouched counters
    are implicit zeros (never materialized)."""
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")
    if d < 1:
        raise ValueError(f"d must be >= 1, got {d}")
    g = list(group_cols or [])
    v = F.col(value_col)
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), cm_hash(v, j, w).alias("col"))
            for j in range(d)
        ]
    )
    return (
        df.filter(v.isNotNull())
        .select(*g, F.explode(pairs).alias("__p"))
        .select(*g, F.col("__p.j").alias("j"), F.col("__p.col").alias("col"))
        .groupBy(*g, "j", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cm_sketch_sql(
    value_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    w: int = CM_W,
    d: int = CM_D,
    where: str | None = None,
) -> str:
    """Standalone DuckDB statement mirroring :func:`cm_sketch` —
    identical salted hashes, identical integer counters."""
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    wh = f"AND ({where})" if where else ""
    branches = " UNION ALL ".join(
        f"SELECT {gsel}{j} AS j, {cm_hash_sql(value_expr, j, w)} AS col"
        f" FROM {from_clause}"
        f" WHERE ({value_expr}) IS NOT NULL {wh}"
        for j in range(d)
    )
    return f"""
    SELECT {gsel}j, col, count(*)::BIGINT AS cnt
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
