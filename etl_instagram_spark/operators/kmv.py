"""K-minimum-values (KMV) distinct sketches with CROSS-ENGINE exact
state — the SET-OPERATION face of the sketch family.

Why in this engine: HLL (operators/sketches.py) answers "how many
distinct" per group, but a 100 TB curation pipeline also needs "how
much do two segments OVERLAP" — distinct-user overlap between event
types, shingle overlap between source domains, contamination overlap
between a training shard and an eval set. HLL registers cannot answer
intersections (inclusion-exclusion on estimates explodes the error);
the KMV synopsis can: keep the k smallest value hashes per segment,
and the union/Jaccard/intersection of two segments are all estimable
from the merged k-sets (Beyer, Haas, Reinwald, Sismanis, Gemulla,
SIGMOD 2007, "On synopses for distinct-value estimation under multiset
operations"; the k-th-minimum estimator goes back to Bar-Yossef et al.
2002). No such surface exists in the reference (its only cardinality
logic is exact key-existence checks) — engine-native scale extension
(SURVEY §7), sibling to HLL/CM/MG/dyadic-CM.

Exactness design (the sketches.py discipline):

- the value hash is the SAME engine-neutral 60-bit md5 kernel as HLL
  (``hll_hash60`` / ``hll_hash60_sql``), so a KMV k-set and an HLL
  register set built from the same column agree on what a "value" is;
- the sketch state IS a set of int64 hashes — the k smallest DISTINCT
  hashes per group. Sets of integers have no float, no order
  ambiguity (hashes are deduped before ranking, so ``row_number`` never
  breaks a tie), and replay bit-for-bit in DuckDB;
- merging two sketches = k smallest of the deduped union — idempotent,
  commutative, associative BY ALGEBRA (like HLL's max-merge, unlike
  CM's sum-merge), so re-merging a replayed batch is a no-op;
- the distinct estimate is ONE double division of exact integers:
  E = (k−1)·2^60 / kth_min (the numerator folded to a single Python
  float literal interpolated into both engines, the HLL-constant
  pattern). When a group holds FEWER than k distinct hashes the k-set
  is the complete value set and every "estimate" is exact by
  construction;
- overlap estimates derive from integer counts over the merged k-set
  K = k-smallest(A ∪ B): ``matches`` = |{h ∈ K : h ∈ A and h ∈ B}|,
  jaccard ≈ matches/|K|, |A ∪ B| ≈ (|K|−1)·2^60/max(K), and the
  intersection estimate is the product of those two certified columns
  — every float is derived from certified integers by a pinned
  expression sequence, identical in both engines.

Standard error of the distinct estimate is ~1/√(k−2) (k=256 → ~6.3 %);
Jaccard error concentrates like a Binomial(k, J) proportion.

Scale: the sketch build is (1) one distinct-shuffle of (group, hash) —
the same dedup any exact distinct pays, (2) a SALTED top-k: k smallest
per (group, hash % 32) in parallel windows, then k smallest of the
≤ 32·k survivors per group — no single task ever sorts a whole group's
distinct set (the WindowExec-skew guard the repo's global-rank
convention exists for). State is ≤ k rows per group; pair overlaps
join k-sets against an O(#groups²) broadcast pair list, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_instagram_spark.operators.sketches import (
    HLL_HASH_BITS,
    hll_hash60,
    hll_hash60_sql,
)

KMV_K = 256      # default k: distinct-estimate std error ~ 1/sqrt(k-2) ≈ 6.3 %
KMV_SALTS = 32   # stage-A fanout of the salted top-k (physical only)


def _check_k(k: int) -> None:
    if not (16 <= k <= 65536):
        raise ValueError(f"k must be in [16, 65536], got {k}")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV synopsis: (group…, h) — the ``k`` smallest
    DISTINCT 60-bit hashes of ``value_col``. NULL values drop out
    (COUNT(DISTINCT) semantics, same as HLL). Deterministic: hashes
    are deduped before ranking, so no tie ever reaches row_number."""
    _check_k(k)
    g = list(group_cols or [])
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*g, hll_hash60(F.col(value_col)).alias("h"))
        .distinct()
    )
    # salted two-stage top-k: k per (group, h % SALTS), then k per group
    salted = hashed.withColumn("_salt", F.pmod(F.col("h"), F.lit(KMV_SALTS)))
    w_a = W.partitionBy(*g, "_salt").orderBy("h")
    stage_a = (
        salted.withColumn("_rn", F.row_number().over(w_a))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    w_b = W.partitionBy(*g).orderBy("h")
    return (
        stage_a.withColumn("_rn", F.row_number().over(w_b))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Merge sketch rows (per-shard / per-epoch k-sets) into one: k
    smallest of the deduped union. Idempotent + commutative +
    associative — replay-safe and split-independent by algebra, which
    is why a continuous face could store k-sets directly (the HLL
    register-store argument)."""
    _check_k(k)
    g = list(group_cols or [])
    w = W.partitionBy(*g).orderBy("h")
    return (
        sketches.select(*g, "h")
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate_expr(k: int = KMV_K) -> tuple:
    """(k_used, kth_min, kmv_estimate) aggregate columns over a k-set —
    the certified summary. kth_min is max(h) over the kept rows (they
    ARE the k smallest); the estimate is the (k−1)-th order-statistic
    estimator when the set is full, the exact count when not."""
    k_used = F.count(F.lit(1)).cast("long")
    kth_min = F.max("h").cast("long")
    const = float((k - 1) * (1 << HLL_HASH_BITS))  # folded double literal
    est = F.when(
        k_used < k, k_used.cast("double")
    ).otherwise(F.round(F.lit(const) / kth_min.cast("double"), 4))
    return (
        k_used.alias("k_used"),
        kth_min.alias("kth_min"),
        est.alias("kmv_estimate"),
    )


def kmv_summary(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Approximate distinct ``value_col`` per group: (group…, k_used,
    kth_min, kmv_estimate). k_used/kth_min are bit-exact cross-engine;
    the estimate is one deterministic double division (exact — not an
    estimate at all — whenever k_used < k)."""
    g = list(group_cols or [])
    sk = kmv_sketch(df, value_col, g, k)
    k_used, kth_min, est = kmv_estimate_expr(k)
    return sk.groupBy(*g).agg(k_used, kth_min, est)


def kmv_overlap(
    sketch: DataFrame,
    group_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Pairwise set-overlap estimates between every unordered pair of
    groups in a :func:`kmv_sketch` output keyed by ONE group column:
    (g_a, g_b, k_used, kth_min, matches, union_est, jaccard_est,
    intersection_est) with g_a < g_b.

    For each pair, K = the k smallest hashes of the deduped union of
    the two k-sets; ``matches`` counts members of K present in BOTH
    sides — K is a uniform random sample of A ∪ B, so matches/|K|
    estimates the Jaccard similarity and (jaccard · union_est) the
    intersection cardinality (Beyer et al., SIGMOD 2007 §4). All
    floats derive from the certified integer columns by a pinned
    expression sequence; when k_used < k both k-sets were complete and
    every column is exact.

    Scale: the pair list is O(#groups²) rows and BROADCAST; the sketch
    (≤ k rows per group) joins it twice by group equality — data-sized
    frames are never crossed."""
    _check_k(k)
    # pin the sketch: FOUR consumers read it (both pair-list distincts
    # and both tagged join sides), and without the pin each re-runs the
    # full sketch build — the distinct + two top-k window shuffles over
    # the raw value scan (r19: 4× the dominant cost of the overlap
    # query). Lazy: the first action materializes ≤ k rows per group.
    sketch = sketch.localCheckpoint(eager=False)
    pairs = (
        sketch.select(F.col(group_col).alias("g_a"))
        .distinct()
        .crossJoin(sketch.select(F.col(group_col).alias("g_b")).distinct())
        .filter(F.col("g_a") < F.col("g_b"))
    )
    side_a = sketch.select(F.col(group_col).alias("g_a"), "h").join(
        F.broadcast(pairs), "g_a"
    )
    side_b = sketch.select(F.col(group_col).alias("g_b"), "h").join(
        F.broadcast(pairs), "g_b"
    )
    tagged = side_a.select(
        "g_a", "g_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    ).unionByName(
        side_b.select(
            "g_a", "g_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
        )
    )
    members = tagged.groupBy("g_a", "g_b", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    w = W.partitionBy("g_a", "g_b").orderBy("h")
    kset = members.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    const = float((k - 1) * (1 << HLL_HASH_BITS))
    k_used = F.count(F.lit(1)).cast("long")
    kth_min = F.max("h").cast("long")
    matches = F.sum((F.col("in_a") * F.col("in_b")).cast("long")).cast("long")
    agg = kset.groupBy("g_a", "g_b").agg(
        k_used.alias("k_used"),
        kth_min.alias("kth_min"),
        matches.alias("matches"),
    )
    # floats in a pinned sequence over the certified integers: union
    # first, jaccard second, intersection = the product of those two
    # already-rounded columns (identical doubles in, identical out)
    out = agg.withColumn(
        "union_est",
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("double")
        ).otherwise(
            F.round(F.lit(const) / F.col("kth_min").cast("double"), 4)
        ),
    ).withColumn(
        "jaccard_est",
        F.round(
            F.col("matches").cast("double") / F.col("k_used").cast("double"),
            6,
        ),
    )
    return out.withColumn(
        "intersection_est",
        F.round(F.col("jaccard_est") * F.col("union_est"), 4),
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors — semantic twins (the salted stage is physical only;
# a plain per-group top-k is the same set)
# ---------------------------------------------------------------------------


def kmv_sketch_sql(
    value_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    k: int = KMV_K,
) -> str:
    """DuckDB statement mirroring :func:`kmv_sketch` — same hash, same
    dedup-then-rank, so the k-set rows match bit-for-bit."""
    _check_k(k)
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    part = ("PARTITION BY " + ", ".join(g)) if g else ""
    h = hll_hash60_sql(value_expr)
    return f"""
    WITH hashed AS (
      SELECT DISTINCT {gsel}{h} AS h
      FROM {from_clause}
      WHERE ({value_expr}) IS NOT NULL),
    ranked AS (
      SELECT {gsel}h, row_number() OVER ({part} ORDER BY h) AS rn
      FROM hashed)
    SELECT {gsel}h FROM ranked WHERE rn <= {k}
    """


def kmv_summary_sql(
    value_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    k: int = KMV_K,
) -> str:
    """DuckDB mirror of :func:`kmv_summary` — identical certified
    integers and the same folded estimate constant."""
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    gby = ("GROUP BY " + ", ".join(g)) if g else ""
    const = repr(float((k - 1) * (1 << HLL_HASH_BITS)))
    inner = kmv_sketch_sql(value_expr, from_clause, g, k)
    return f"""
    WITH kset AS ({inner})
    SELECT {gsel}count(*)::BIGINT AS k_used,
           max(h)::BIGINT AS kth_min,
           CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
                ELSE round({const} / max(h)::DOUBLE, 4) END AS kmv_estimate
    FROM kset {gby}
    """


def kmv_overlap_sql(
    value_expr: str,
    from_clause: str,
    group_expr: str,
    k: int = KMV_K,
) -> str:
    """DuckDB mirror of :func:`kmv_overlap` over a sketch built from
    the same (value, group) pair — the same pair expansion, merged
    k-set, integer counts, and pinned float sequence. ``group_expr``
    must be a BARE column name (it is re-referenced as ``s.<name>``
    inside the pair-membership join)."""
    _check_k(k)
    const = repr(float((k - 1) * (1 << HLL_HASH_BITS)))
    sketch = kmv_sketch_sql(value_expr, from_clause, [group_expr], k)
    return f"""
    WITH sk AS ({sketch}),
    pairs AS (
      SELECT a.{group_expr} AS g_a, b.{group_expr} AS g_b
      FROM (SELECT DISTINCT {group_expr} FROM sk) a,
           (SELECT DISTINCT {group_expr} FROM sk) b
      WHERE a.{group_expr} < b.{group_expr}),
    members AS (
      SELECT p.g_a, p.g_b, s.h,
             max(CASE WHEN s.{group_expr} = p.g_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN s.{group_expr} = p.g_b THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN sk s
        ON s.{group_expr} IN (p.g_a, p.g_b)
      GROUP BY p.g_a, p.g_b, s.h),
    kset AS (
      SELECT * FROM (
        SELECT g_a, g_b, h, in_a, in_b,
               row_number() OVER (PARTITION BY g_a, g_b ORDER BY h) AS rn
        FROM members) WHERE rn <= {k}),
    agg AS (
      SELECT g_a, g_b,
             count(*)::BIGINT AS k_used,
             max(h)::BIGINT AS kth_min,
             sum(in_a * in_b)::BIGINT AS matches
      FROM kset GROUP BY g_a, g_b),
    est AS (
      SELECT g_a, g_b, k_used, kth_min, matches,
             CASE WHEN k_used < {k} THEN k_used::DOUBLE
                  ELSE round({const} / kth_min::DOUBLE, 4) END AS union_est,
             round(matches::DOUBLE / k_used::DOUBLE, 6) AS jaccard_est
      FROM agg)
    SELECT g_a, g_b, k_used, kth_min, matches, union_est, jaccard_est,
           round(jaccard_est * union_est, 4) AS intersection_est
    FROM est
    """


# ---------------------------------------------------------------------------
# bottom-k sampling: the k-set AS a deterministic uniform sample
# ---------------------------------------------------------------------------


def kmv_sample(
    df: DataFrame,
    id_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Deterministic uniform sample of (up to) ``k`` DISTINCT ids per
    group via bottom-k hashing: a row is sampled iff hash(id) is among
    the group's k smallest — conditionally a simple random sample
    without replacement of the distinct ids (bottom-k sketches, Cohen &
    Kaplan, PODC 2007), because the md5 hash orders ids uniformly and
    independently of any data attribute. Where sampling.py's hash_split
    fixes a RATE, this fixes a SIZE: the fixed-k eval/holdout snapshot
    a training pipeline wants regardless of corpus growth.

    Properties the float-free construction buys: replayable
    (engine-neutral hash, no RNG state), the same sample from any
    partitioning or batch split, and CONTINUOUSLY MAINTAINABLE — feed
    ``streaming.incremental.kmv_read_sketch`` output as a k-set into
    the same semijoin and the sample follows the stream with
    O(groups · k) state (membership only ever shrinks toward smaller
    hashes as new ids arrive). All rows of a sampled id are kept
    (documented: it samples IDS, not rows).

    Scale: the k-set is ≤ groups·k rows and joins back BROADCAST
    LeftSemi — the corpus is scanned once and never shuffled."""
    g = list(group_cols or [])
    sk = kmv_sketch(df, id_col, g, k).withColumnRenamed("h", "_h")
    withh = df.withColumn("_h", hll_hash60(F.col(id_col)))
    return withh.join(F.broadcast(sk), [*g, "_h"], "leftsemi").drop("_h")


def kmv_sample_sql(
    select_cols: str,
    id_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    k: int = KMV_K,
) -> str:
    """DuckDB mirror of :func:`kmv_sample` — the same k-set CTE
    semijoined back by (group…, hash). ``from_clause`` must be a table
    or view NAME (it appears twice, once aliased ``t``) and ``id_expr``
    / ``group_exprs`` bare column names."""
    g = list(group_exprs or [])
    kset = kmv_sketch_sql(id_expr, from_clause, g, k)
    on = " AND ".join(
        [f"t.{e} = ks.{e}" for e in g]
        + [f"{hll_hash60_sql('t.' + id_expr)} = ks.h"]
    )
    return f"""
    WITH ks AS ({kset})
    SELECT {select_cols}
    FROM {from_clause} t
    WHERE EXISTS (SELECT 1 FROM ks WHERE {on})
    """


_2_60 = float(1 << HLL_HASH_BITS)  # folded constant, same literal both engines


def kmv_weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Deterministic fixed-size WEIGHTED sample of (up to) ``k``
    distinct ids per group — priority sampling (Duffield, Lund, Thorup,
    JACM 2007) on the bottom-k rank order of Cohen & Kaplan (PODC
    2007): item i gets priority q_i = w_i / u_i with u_i = (h_i+1)/2^60
    from the SAME engine-neutral md5 hash kernel as every other sketch
    here, and the k largest priorities are the sample — equivalently
    the k smallest ranks (h_i+1)/w_i, which is how both engines order
    it. Where :func:`kmv_sample` draws ids uniformly, this draws them
    with probability increasing in weight (token count, byte size,
    click mass), and the ``est_weight`` column makes the sample
    SUBSET-SUM CAPABLE: with τ the (k+1)-th largest priority,
    ŵ_i = max(w_i, τ) satisfies E[Σ_{i∈S∩A} ŵ_i] = Σ_{i∈A} w_i for
    every item subset A (unbiased over the u ensemble; with the fixed
    hash it is a replayable deterministic snapshot, the same framing
    as kmv_sample's uniformity). A group with ≤ k distinct ids is
    sampled COMPLETELY and est_weight = weight exactly (no threshold
    exists).

    Exactness (the module discipline): the rank key is ONE IEEE
    division of exact integers per id — CAST(h+1 AS DOUBLE)/CAST(w AS
    DOUBLE), identical text in the DuckDB mirror; int64→double casts
    and division are correctly rounded (round-to-nearest) in both
    engines, and the unique hash h breaks any rank tie, so the
    selection replays bit-for-bit (no libm anywhere). τ's reciprocal
    is the same pinned shape: (2^60·w_T)/(h_T+1) with the 2^60 folded
    to one float literal.

    Validation is LOUD: weights must be positive and finite, and an id
    carrying two different weights in one group raises (an ambiguous
    weighted universe would silently change inclusion probabilities).

    Scale: one distinct-shuffle of (group, id, weight) + the same
    salted two-stage top-k as kmv_sketch (no single task sorts a
    group), carrying k+1 rows per group so the threshold never needs a
    second pass. Output is ≤ groups·k rows — broadcastable back for a
    row-level semijoin exactly like kmv_sample.

    Returns (group…, ``id_col``, ``weight_col``, h, est_weight)."""
    state = kmv_weighted_state(df, id_col, weight_col, group_cols, k)
    return kmv_weighted_sample_from_state(
        state, id_col, weight_col, group_cols, k
    )


def kmv_weighted_state(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """The bottom-(k+1)-by-priority-rank STATE rows behind
    :func:`kmv_weighted_sample`: (group…, ``id_col``, ``weight_col``,
    h) for the k+1 smallest ranks per group (the +1 row is the
    threshold). Selection by a total order commutes with partitioning,
    so merging per-batch states (:func:`kmv_weighted_state_merge`) ==
    the state of the concatenated input — idempotent/commutative/
    associative BY ALGEBRA like the k-set sketch, which is what the
    continuous face stores per epoch. Validation (positive finite
    weights, one weight per id) is loud here, once, for every caller."""
    _check_k(k)
    g = list(group_cols or [])
    pairs = (
        df.filter(F.col(id_col).isNotNull())
        .select(*g, id_col, weight_col)
        .distinct()
        .localCheckpoint(eager=False)
    )
    # try_cast, not cast: under ANSI (the Spark 4 default) a plain cast
    # of a non-numeric weight would blow up this validation job with a
    # raw NumberFormatException instead of the documented loud
    # ValueError; under non-ANSI it would return NULL and make every
    # other predicate NULL, slipping the filter entirely — and the NULL
    # rank would then sort nulls-first straight into the sample
    wd = F.expr(f"try_cast({weight_col} AS DOUBLE)")
    bad = (
        pairs.filter(
            F.col(weight_col).isNull()
            | wd.isNull()
            | (wd <= 0)
            | F.isnan(wd)
            | (wd == float("inf"))
        )
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"kmv_weighted_sample: weight {bad[0][weight_col]!r} for "
            f"{id_col}={bad[0][id_col]!r} — weights must be positive "
            "finite numbers"
        )
    dup = (
        pairs.groupBy(*g, id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"kmv_weighted_sample: {id_col}={dup[0][id_col]!r} carries "
            "more than one weight in a group — aggregate to one weight "
            "per id first (ambiguous weights change inclusion "
            "probabilities silently)"
        )
    ranked0 = pairs.withColumn("h", hll_hash60(F.col(id_col))).withColumn(
        "_rank",
        (F.col("h") + F.lit(1)).cast("double")
        / F.col(weight_col).cast("double"),
    )
    # salted two-stage bottom-(k+1): the +1 row IS the threshold
    salted = ranked0.withColumn("_salt", F.pmod(F.col("h"), F.lit(KMV_SALTS)))
    w_a = W.partitionBy(*g, "_salt").orderBy("_rank", "h")
    stage_a = (
        salted.withColumn("_rn", F.row_number().over(w_a))
        .filter(F.col("_rn") <= k + 1)
        .drop("_salt", "_rn")
    )
    w_b = W.partitionBy(*g).orderBy("_rank", "h")
    return (
        stage_a.withColumn("_rn", F.row_number().over(w_b))
        .filter(F.col("_rn") <= k + 1)
        .drop("_rn", "_rank")
    )


def kmv_weighted_state_merge(
    states: DataFrame,
    id_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Merge state rows (per-shard / per-epoch bottom-(k+1) frames)
    into one: the k+1 smallest ranks of the deduped union — replay-safe
    and split-independent by algebra (re-seeing an id is HARMLESS here,
    unlike count-valued stores: identical rows dedup away). An id whose
    weight CHANGED between shards is detected loudly (two rows share a
    hash) — a mutated weight would silently change every inclusion
    probability. The frame is ≤ shards·groups·(k+1) rows, so one plain
    per-group window is fine (the kmv_merge shape)."""
    _check_k(k)
    g = list(group_cols or [])
    uniq = states.select(*g, id_col, weight_col, "h").distinct()
    amb = (
        uniq.groupBy(*g, "h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if amb:
        raise ValueError(
            "kmv_weighted_state_merge: an id carries different weights "
            f"across state shards (hash {amb[0]['h']}) — weighted "
            "priorities are defined for a FIXED weight per id; repair "
            "the stream before merging"
        )
    ranked = uniq.withColumn(
        "_rank",
        (F.col("h") + F.lit(1)).cast("double")
        / F.col(weight_col).cast("double"),
    )
    w_b = W.partitionBy(*g).orderBy("_rank", "h")
    return (
        ranked.withColumn("_rn", F.row_number().over(w_b))
        .filter(F.col("_rn") <= k + 1)
        .drop("_rn", "_rank")
    )


def kmv_weighted_sample_from_state(
    state: DataFrame,
    id_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    k: int = KMV_K,
) -> DataFrame:
    """Sample + subset-sum estimator from a (merged) bottom-(k+1)
    state frame — the read face both the batch operator and the
    continuous store share, so the two are row-identical by
    construction. Re-ranks the ≤ groups·(k+1) rows (model-sized) and
    derives est_weight with the pinned float shapes."""
    _check_k(k)
    g = list(group_cols or [])
    ranked = state.withColumn(
        "_rank",
        (F.col("h") + F.lit(1)).cast("double")
        / F.col(weight_col).cast("double"),
    )
    w_b = W.partitionBy(*g).orderBy("_rank", "h")
    topk1 = ranked.withColumn("_rn", F.row_number().over(w_b)).filter(
        F.col("_rn") <= k + 1
    )
    tau = topk1.filter(F.col("_rn") == k + 1).select(
        *g,
        (
            F.lit(_2_60) * F.col(weight_col).cast("double")
            / (F.col("h") + F.lit(1)).cast("double")
        ).alias("_inv_tau"),
    )
    sample = topk1.filter(F.col("_rn") <= k).drop("_rn", "_rank")
    # tau is ≤ 1 row per group (0 when the group is complete)
    joined = (
        sample.join(tau, g, "left")
        if g
        else sample.join(tau, F.lit(True), "left")
    )
    return joined.select(
        *g,
        id_col,
        weight_col,
        "h",
        F.when(
            F.col("_inv_tau").isNull(), F.col(weight_col).cast("double")
        )
        .otherwise(
            F.greatest(F.col(weight_col).cast("double"), F.col("_inv_tau"))
        )
        .alias("est_weight"),
    )


def kmv_weighted_sample_sql(
    id_expr: str,
    weight_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    k: int = KMV_K,
) -> str:
    """DuckDB mirror of :func:`kmv_weighted_sample` — the same distinct
    pairs → hash → one-division rank → row_number bottom-(k+1) →
    threshold-or-exact est_weight, with identical float expression
    text. ``from_clause`` must be a table/view name and ``id_expr`` /
    ``weight_expr`` / ``group_exprs`` bare column names. Returns rows
    (group…, id, weight, h, est_weight)."""
    g = list(group_exprs or [])
    gsel = "".join(f"{e}, " for e in g)
    part = f"PARTITION BY {', '.join(g)} " if g else ""
    on = " AND ".join(f"t.{e} = x.{e}" for e in g) if g else "TRUE"
    # ONE shared ranked CTE (hash computed once per row, aliased for the
    # rank division) serves both the _rn <= k sample branch and the
    # _rn = k+1 threshold branch — the kmv_weighted_sample_from_state
    # shape; duplicating the distinct+hash pipeline per branch made the
    # oracle pay ~4x the md5 work
    return f"""
    WITH wk_ranked AS MATERIALIZED (
      SELECT *, row_number() OVER ({part}ORDER BY _rank, h) AS _rn
      FROM (
        SELECT {gsel}{id_expr}, {weight_expr}, h,
               CAST(h + 1 AS DOUBLE)
                 / CAST({weight_expr} AS DOUBLE) AS _rank
        FROM (SELECT {gsel}{id_expr}, {weight_expr},
                     {hll_hash60_sql(id_expr)} AS h
              FROM (SELECT DISTINCT {gsel}{id_expr}, {weight_expr}
                    FROM {from_clause}
                    WHERE {id_expr} IS NOT NULL) p) ph
      ) r
    )
    SELECT {gsel}{id_expr}, {weight_expr}, h, est_weight FROM (
      SELECT t.*, CASE WHEN x._inv_tau IS NULL
                       THEN CAST(t.{weight_expr} AS DOUBLE)
                       ELSE greatest(CAST(t.{weight_expr} AS DOUBLE),
                                     x._inv_tau) END AS est_weight
      FROM wk_ranked t
      LEFT JOIN (
        SELECT {gsel}({_2_60!r} * CAST({weight_expr} AS DOUBLE))
                 / CAST(h + 1 AS DOUBLE) AS _inv_tau
        FROM wk_ranked
        WHERE _rn = {k + 1}
      ) x ON {on}
      WHERE t._rn <= {k}
    ) out
    ORDER BY {gsel}h
    """
