"""LLM-data-pipeline queries over the ``documents`` and ``embeddings``
tables: text analysis, dedup (exact / MinHash-LSH), and embedding
similarity search (brute-force kNN + hyperplane-LSH ANN).

Each query registers BOTH the Spark plan and its DuckDB oracle SQL; the
SQL is generated from the same Python constants (minhash coefficients,
language markers, hyperplane signs) so the two sides cannot drift.

Reference lineage: the reference's only dedup is key-based existence
checks (posts-from-hashtags.js:295-300); the text kernels generalize its
LDA preprocessing (lda/index.js:34-48). The near-dup/similarity operators
are the engine's scale extensions (SURVEY §7 step 11).

Scale notes (100 TB):
- every text kernel is a per-row projection inside the scan stage — no
  shuffle until the final aggregation;
- MinHash-LSH is the scale-correct near-dup shape: signatures are
  per-row, candidate generation groups by (band, band_hash) — never an
  all-pairs join; bucket sizes are bounded by collision probability, and
  skewed buckets (boilerplate dups) are exactly the rows you want to
  inspect;
- brute-force kNN broadcasts ONE query vector (O(1) bytes) and does a
  single scan + TakeOrderedAndProject — no shuffle of the embedding
  column; the LSH variant prunes the scan to one bucket, which is the
  100× path (bucket ≈ 1/2^bits of the table).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_instagram_spark.functions import text as T
from etl_instagram_spark.plans.oracle import oracle, sql_revenue_dec
from etl_instagram_spark.plans.queries import query, _t

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB) mirroring functions/text.py kernels
# ---------------------------------------------------------------------------

# the whitespace class is spelled out (not \s) for the same reason as
# text.BPE_SPLIT_PATTERN: the Spark side tokenizes with Java \s, which
# includes U+000B while RE2's (DuckDB's) \s does not — the explicit set
# IS Java's \s, so both engines split identically on any input
SQL_WS = r" \t\n\x0B\f\r"
SQL_TOKS = rf"regexp_split_to_array(trim(lower(text)), '[{SQL_WS}]+')"


def _sql_marker_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({words})))"


def _sql_detect_language() -> str:
    """CASE chain in (en, es, fr, de) order — same tie-break as
    text.detect_language."""
    hits = {lang: _sql_marker_hits(lang) for lang in T.LANG_MARKERS}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    arms = "\n".join(
        f"WHEN {h} = {best} AND {best} > 0 THEN '{lang}'" for lang, h in hits.items()
    )
    return f"CASE {arms} ELSE 'und' END"


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy per-row kernels can use every core: small local
    test files are a single parquet row group → one partition → one core.
    Repartition ONLY when the scan's parallelism is far below the
    cluster's (at 100 TB the file count provides natural parallelism and
    this is a no-op; locally it turns a 1-core text scan into 32)."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# documents: token stats
# ---------------------------------------------------------------------------


@query("docs_token_stats")
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token/char statistics (training-data profiling).
    Single scan → partial agg; 20 groups."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    n_tok = T.token_count(F.col("text"))
    n_bpe = T.bpe_token_count(F.col("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(n_tok), 4).alias("avg_tokens"),
            F.max(n_tok).alias("max_tokens"),
            F.round(F.avg(n_bpe), 4).alias("avg_bpe_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("source")
    )


oracle(
    "docs_token_stats",
    f"""
    SELECT source,
           count(*) AS n_docs,
           round(avg(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len({SQL_TOKS}) END), 4) AS avg_tokens,
           max(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len({SQL_TOKS}) END)           AS max_tokens,
           round(avg({T.bpe_token_count_sql("text")}), 4) AS avg_bpe_tokens,
           round(avg(n_chars), 2)                       AS avg_chars
    FROM documents GROUP BY source ORDER BY source
    """,
)


# ---------------------------------------------------------------------------
# documents: language identification
# ---------------------------------------------------------------------------


@query("docs_language_mix")
def docs_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labelled-vs-detected language confusion counts (n-gram-heuristic
    language ID over marker stopwords)."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return (
        docs.withColumn("detected", T.detect_language(F.col("text")))
        .groupBy("lang", "detected")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "detected")
    )


oracle(
    "docs_language_mix",
    f"""
    WITH t AS (SELECT lang, {SQL_TOKS} AS toks FROM documents)
    SELECT lang, {_sql_detect_language()} AS detected, count(*) AS n_docs
    FROM t GROUP BY lang, detected ORDER BY lang, detected
    """,
)


# ---------------------------------------------------------------------------
# documents: quality score bands
# ---------------------------------------------------------------------------


# (docs_quality_bands rotated out of the gate in r6 to make room for
# docs_bpe_tokens — quality scoring stays gated via docs_gopher_filter's
# nine-rule profile; parity in plans/parity_extras.py)
def docs_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter profile: docs per score band (the distribution a
    training-data filter thresholds against)."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    q = T.quality_score(F.col("text"))
    band = (
        F.when(q < 0.25, "q0_low")
        .when(q < 0.5, "q1_midlow")
        .when(q < 0.75, "q2_midhigh")
        .otherwise("q3_high")
    )
    return (
        docs.select(band.alias("band"), q.alias("q"))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            # q is a 4dp-rounded score: exact DECIMAL sum so the mean's
            # 4dp re-round can't sit on a summation-order tie
            F.round(
                F.sum(F.col("q").cast("decimal(14,4)")).cast("double") / F.count("*"),
                4,
            ).alias("avg_score"),
        )
        .orderBy("band")
    )


_SQL_EN_MARKERS = ", ".join(f"'{w}'" for w in T.LANG_MARKERS["en"])
_SQL_QUALITY = f"""
round(
  (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.0 END) * 0.4
  + least((CASE WHEN length(trim(text)) = 0 THEN 0.0
           ELSE len(list_filter(toks, t -> t IN ({_SQL_EN_MARKERS})))::DOUBLE
                / len(toks) END) * 4.0, 1.0) * 0.4
  + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
                  ELSE length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE
                       / length(text) END) * 10.0, 1.0)) * 0.2,
  4)
"""

# (docs_quality_bands rotated to plans/parity_extras.py in r6)
SQL_DOCS_QUALITY_BANDS = f"""
    WITH t AS (SELECT text, {SQL_TOKS} AS toks FROM documents),
         s AS (SELECT {_SQL_QUALITY} AS q FROM t)
    SELECT CASE WHEN q < 0.25 THEN 'q0_low'
                WHEN q < 0.5  THEN 'q1_midlow'
                WHEN q < 0.75 THEN 'q2_midhigh'
                ELSE 'q3_high' END AS band,
           count(*) AS n_docs,
           round(CAST(sum(CAST(q AS DECIMAL(14,4))) AS DOUBLE) / count(*), 4)
             AS avg_score
    FROM s GROUP BY band ORDER BY band
    """


_BPE_N_MERGES = 24
_BPE_MAX_WORDS = 65536


@query("docs_bpe_tokens")
def docs_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE tokenizer on the corpus, then count learned-subword
    tokens per source — tokenizer TRAINING as a gated pipeline stage.

    The distributed part is exactly what must be distributed at 100 TB:
    one explode+count pass for the word-frequency table (map-side
    combined) and one Arrow-batched encode pass with the learned merges
    (per-word memoized, operators/tokenizer.py). The merge loop itself
    runs on the driver over the bounded frequency table — the shape
    every real subword trainer uses. Deterministic end to end
    (sort-before-cap collection, smallest-pair tie-break), so the oracle
    re-learns identical merges from DuckDB's word counts and replays the
    encode as an inlined word→token-count map: any cross-engine drift in
    splitting, counting, ordering, or the merge loop breaks the hash."""
    from etl_instagram_spark.operators.tokenizer import bpe_token_count, fit_bpe

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    merges = fit_bpe(
        docs, "text", n_merges=_BPE_N_MERGES, max_words=_BPE_MAX_WORDS
    )
    return (
        docs.select("source", bpe_token_count("text", merges).alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("bpe_tokens"),
            F.round(F.sum("nt") / F.count(F.lit(1)), 4).alias("avg_bpe_per_doc"),
        )
        .orderBy("source")
    )


def _bpe_fit_word_map() -> tuple[str, str]:
    """Shared oracle scaffolding: re-learn the gate's BPE merges from
    DuckDB's word counts (same ordered/capped table, same pure loop) and
    return ``(split_expr, wm_values)`` — the word-splitting SQL and the
    inline word→token-count VALUES list every BPE mirror joins against.
    Asserts the cap covered the full distinct-word inventory (true at
    gate scale by construction)."""
    import os

    import duckdb

    from etl_instagram_spark.operators.tokenizer import (
        WORD_SPLIT_REGEX,
        bpe_apply,
        learn_bpe,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "documents.parquet")
    con = duckdb.connect()
    split = f"string_split_regex(lower(text), '{WORD_SPLIT_REGEX}')"
    freqs = con.sql(
        f"""
        SELECT w AS word, count(*) AS freq
        FROM (SELECT unnest({split}) AS w FROM '{path}' WHERE text IS NOT NULL)
        WHERE w <> ''
        GROUP BY w ORDER BY freq DESC, word ASC LIMIT {_BPE_MAX_WORDS}
        """
    ).fetchall()
    words = [w for w, _ in freqs]
    n_distinct = con.sql(
        f"SELECT count(DISTINCT w) FROM (SELECT unnest({split}) AS w "
        f"FROM '{path}' WHERE text IS NOT NULL) WHERE w <> ''"
    ).fetchone()[0]
    con.close()
    if n_distinct > len(words):
        raise AssertionError(
            f"oracle word map incomplete: {n_distinct} distinct words > cap"
        )
    merges = learn_bpe([(w, int(f)) for w, f in freqs], _BPE_N_MERGES)
    wm = ", ".join(
        "('{}', {})".format(w.replace("'", "''"), len(bpe_apply(w, merges)))
        for w in sorted(words)
    )
    return split, wm


def _bpe_oracle_sql() -> str:
    """DuckDB mirror of docs_bpe_tokens (lazy — its literals are LEARNED
    from the gate data): count words in DuckDB with the same explicit
    whitespace class, feed the same ordered/capped frequency table
    through the same ``learn_bpe`` loop, then inline the resulting
    word→token-count map (every distinct corpus word through
    ``bpe_apply``) as a VALUES join."""
    split, wm = _bpe_fit_word_map()
    return f"""
    WITH wm(word, nt) AS (VALUES {wm}),
    doc_words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest({split}) AS w
        FROM documents WHERE text IS NOT NULL)
      WHERE w <> ''),
    per_doc AS (
      SELECT d.doc_id, d.source, coalesce(sum(wm.nt), 0) AS nt
      FROM documents d
      LEFT JOIN doc_words x ON d.doc_id = x.doc_id
      LEFT JOIN wm ON x.w = wm.word
      GROUP BY d.doc_id, d.source)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS bpe_tokens,
           round(CAST(sum(nt) AS BIGINT) / count(*), 4) AS avg_bpe_per_doc
    FROM per_doc GROUP BY source ORDER BY source
    """


oracle("docs_bpe_tokens", _bpe_oracle_sql)


# ---------------------------------------------------------------------------
# documents: rolling-hash fingerprint profile
# ---------------------------------------------------------------------------


@query("docs_fingerprint_profile")
def docs_fingerprint_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint distribution: docs per fp%16 bucket +
    distinct fingerprints (dup fingerprints ⇒ near-identical docs)."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    # stage fp once — referencing the expression twice (bucket + value)
    # would run the md5-per-shingle pipeline twice per row
    staged = docs.withColumn("fp", T.rolling_fingerprint(F.col("text")))
    fp = F.col("fp")
    return (
        staged.select((fp % 16).alias("fp_bucket"), fp.alias("fp"))
        .groupBy("fp_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct(F.col("fp")).alias("n_distinct_fp"),
        )
        .orderBy("fp_bucket")
    )


oracle(
    "docs_fingerprint_profile",
    f"""
    WITH s AS (
      SELECT list_min(list_transform(
               [substr(text, i, 8)
                for i in range(1, greatest(length(text) - 7, 1) + 1)],
               s -> {T.hash32_sql('s')})) AS fp
      FROM documents)
    SELECT fp % 16 AS fp_bucket,
           count(*) AS n_docs,
           count(DISTINCT fp) AS n_distinct_fp
    FROM s GROUP BY fp_bucket ORDER BY fp_bucket
    """,
)


# ---------------------------------------------------------------------------
# documents: exact dedup by content hash
# ---------------------------------------------------------------------------


@query("docs_exact_dedup")
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate audit per source: docs vs distinct content hashes.
    The hash-groupBy IS the dedup plan at 100 TB — one shuffle on a
    32-byte key, AQE handles skewed dup clusters."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    return (
        docs.select("source", F.md5(F.col("text")).alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct(F.col("h")).alias("n_unique"),
            (F.count("*") - F.count_distinct(F.col("h"))).alias("n_dup_rows"),
        )
        .orderBy("source")
    )


oracle(
    "docs_exact_dedup",
    """
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           count(*) - count(DISTINCT md5(text)) AS n_dup_rows
    FROM documents GROUP BY source ORDER BY source
    """,
)


# ---------------------------------------------------------------------------
# documents: MinHash-LSH banding profile
# ---------------------------------------------------------------------------

MINHASH_K = 8
MINHASH_BANDS = 4  # rows-per-band = 2
# band hashes on BOTH sides come from the same generators in
# operators/dedup.py (_band_hashes / band_hash_sql), so the pack formula
# (exact 2^31 digit pack at rows≤2, modular fold above) cannot drift
# between Spark, the oracle, and the dedup operators themselves


# (docs_minhash_bands rotated out of the gate in r6 to make room for
# docs_heavy_hitters / docs_ngram_jaccard — the banding machinery stays
# gated end-to-end via docs_near_dedup_summary, which replays signature →
# bands → candidates → verify; DuckDB parity retained in
# plans/parity_extras.py)


def _sql_minhash_sig() -> str:
    perms = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * (h % {T.HASH_PRIME}) + {b}) % {T.HASH_PRIME}))"
        for a, b in T.minhash_coefficients(MINHASH_K)
    )
    return f"[{perms}]"


def _sql_band_hashes() -> str:
    from etl_instagram_spark.operators.dedup import band_hash_sql

    return band_hash_sql("sig", MINHASH_K, MINHASH_BANDS)


def _sql_minhash_bands() -> str:
    """The rotated docs_minhash_bands oracle, kept here (next to the
    fragment generators it shares with docs_near_dedup_summary) for
    plans/parity_extras.py."""
    return f"""
    WITH t AS (SELECT trim(lower(text)) AS norm, {SQL_TOKS} AS toks FROM documents),
         s AS (SELECT CASE WHEN len(toks) < 3 THEN [norm]
                    ELSE [array_to_string(toks[i:i+2], ' ')
                          for i in range(1, len(toks) - 1)] END AS sh
               FROM t),
         h AS (SELECT list_transform(sh, s -> {T.hash32_sql('s')}) AS hs FROM s),
         sig AS (SELECT {_sql_minhash_sig()} AS sig FROM h),
         bh AS (SELECT {_sql_band_hashes()} AS bh FROM sig),
         bands AS (SELECT u.j AS band_idx, bh[u.j + 1] AS band_hash
                   FROM bh CROSS JOIN (SELECT unnest(range({MINHASH_BANDS})) AS j) u),
         buckets AS (SELECT band_idx, band_hash, count(*) AS n
                     FROM bands GROUP BY band_idx, band_hash)
    SELECT band_idx,
           count(*) AS n_buckets,
           max(n) AS max_bucket,
           CAST(sum(n * (n - 1) / 2) AS BIGINT) AS n_candidate_pairs
    FROM buckets GROUP BY band_idx ORDER BY band_idx
    """


# ---------------------------------------------------------------------------
# embeddings: brute-force cosine top-k
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — same IEEE summation order as the
    oracle's list_dot_product, so doubles agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


# (emb_knn_cosine rotated out of the gate in r6 to make room for
# emb_semantic_dedup — the exact-cosine surface stays gated via the
# ground-truth sides of emb_ann_recall / emb_knn_join_recall; this
# single-query shape keeps DuckDB parity via plans/parity_extras.py)
def emb_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-10 cosine neighbors of vec_id=0. One scan, the
    query vector broadcast as a 1-row dimension, TakeOrderedAndProject —
    no shuffle of the embedding column; the at-scale baseline ANN."""
    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    qv = emb.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("qv")
    )
    v = _as_double(F.col("embedding"))
    cos = _dot(v, F.col("qv")) / (
        F.sqrt(_dot(v, v)) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


SQL_KNN_COSINE = """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_dot_product(embedding::DOUBLE[], qv)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM embeddings CROSS JOIN q
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """


# ---------------------------------------------------------------------------
# embeddings: hyperplane-LSH buckets + bucketed ANN
# ---------------------------------------------------------------------------

HYPERPLANE_BITS = 8
EMBEDDING_DIM = 64


def hyperplane_signs(bits: int = HYPERPLANE_BITS, dim: int = EMBEDDING_DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 parity — reproducible on any
    engine, no PRNG state to ship."""
    return [
        [
            1 if int(hashlib.md5(f"hp:{j}:{i}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1
            for i in range(dim)
        ]
        for j in range(bits)
    ]


_PLANES = hyperplane_signs()


def _bucket_col() -> Column:
    v = _as_double(F.col("embedding"))
    bits = []
    for j, plane in enumerate(_PLANES):
        w = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(_dot(v, w) >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def _sql_bucket() -> str:
    terms = []
    for j, plane in enumerate(_PLANES):
        lit = "[" + ", ".join(f"{x}.0" for x in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


# (the per-vector bucket computation itself is oracle-replayed inside
# emb_ann_lsh_topk and emb_ann_recall — a separate histogram query added
# no new checked surface)


# (emb_ann_lsh_topk rotated out of the gate in r6 to make room for
# emb_knn_join_recall — the bucket-filtered top-k path stays gated via
# emb_ann_recall and the new self-join recall query; DuckDB parity
# retained in plans/parity_extras.py via _sql_ann_lsh_topk below)


def _sql_ann_lsh_topk() -> str:
    return f"""
    WITH b AS (SELECT vec_id, label, embedding, {_sql_bucket()} AS bucket
               FROM embeddings),
         q AS (SELECT embedding::DOUBLE[] AS qv, bucket AS qbucket
               FROM b WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_dot_product(embedding::DOUBLE[], qv)
                 / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
    FROM b CROSS JOIN q
    WHERE bucket = qbucket AND vec_id <> 0
    ORDER BY cos_sim DESC, vec_id
    LIMIT 5
    """


@query("emb_near_dedup")
def emb_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.near_dedup_embeddings run whole: hyperplane-LSH
    buckets (8 bits) → multi-probe Hamming ≤ 1 candidates → exact cosine
    ≥ 0.35 verify → drop-larger-id survivors, reduced to a one-row
    summary. The oracle replays every stage in SQL from the SAME
    hyperplane constants (Hamming-radius probing collapses to
    ``bit_count(xor(bucket_a, bucket_b)) <= r`` on the pair), so this is
    an end-to-end gate on the embedding near-dup operator — the one
    dedup-family member that previously had no oracle row. The loose
    0.35 threshold is deliberate: the synthetic vectors are isotropic
    (no planted near-dups), and a threshold the data can actually cross
    makes the verify+survivor path produce a non-trivial, value-checked
    count instead of vacuously passing at 0.97.

    Single action: survivors left-join back to the scan; one aggregate
    emits all counters. (Replaces emb_label_stats, whose array-math
    surface emb_knn_cosine already exercises.)"""
    from etl_instagram_spark.operators.dedup import near_dedup_embeddings

    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    kept = near_dedup_embeddings(
        emb, "vec_id", "embedding", threshold=0.35, bits=HYPERPLANE_BITS,
        multi_probe_hamming=1, dim=EMBEDDING_DIM,
    ).select("vec_id", F.lit(1).alias("__kept"))
    return (
        emb.join(kept, "vec_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count("__kept").alias("n_survivors"),
        )
        .select(
            "n_vecs",
            "n_survivors",
            (F.col("n_vecs") - F.col("n_survivors")).alias("n_dropped"),
        )
    )


oracle(
    "emb_near_dedup",
    f"""
    WITH b AS (SELECT vec_id, embedding, {_sql_bucket()} AS bucket FROM embeddings),
         pairs AS (
           SELECT a.vec_id AS ia, bb.vec_id AS ib,
                  list_dot_product(a.embedding::DOUBLE[], bb.embedding::DOUBLE[])
                  / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(bb.embedding::DOUBLE[], bb.embedding::DOUBLE[]))) AS cos
           FROM b a JOIN b bb
             ON bit_count(xor(a.bucket, bb.bucket)) <= 1
                AND a.vec_id < bb.vec_id),
         losers AS (SELECT DISTINCT ib FROM pairs WHERE cos >= 0.35)
    SELECT (SELECT count(*) FROM embeddings) AS n_vecs,
           (SELECT count(*) FROM embeddings) - (SELECT count(*) FROM losers) AS n_survivors,
           (SELECT count(*) FROM losers) AS n_dropped
    """,
)


@query("emb_semantic_dedup")
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.semantic_dedup run whole (SemDeDup, Abbas et al.
    2023): seeded-Lloyd's coarse quantizer (8 cells, same deterministic
    fit as emb_ann_ivf_recall) → within-cell cosine pairs ≥ 0.35 →
    drop-larger-id survivors, summarized PER CELL so the hash checks the
    cell assignment, the pair scoring, and the survivor rule together.
    Exercises the stored-cell path (``cell_col``) — the ingest-time
    stamping contract ``ann_ivf_topk`` shares.

    Threshold 0.35 for the same reason as emb_near_dedup: the synthetic
    vectors are isotropic, and a crossable threshold makes the verify +
    survivor path produce non-trivial counts (≈100 within-cell pairs at
    sf0.01) instead of vacuously passing."""
    from etl_instagram_spark.operators.dedup import semantic_dedup_pairs
    from etl_instagram_spark.operators.similarity import (
        fit_ivf_centroids,
        ivf_cell,
    )

    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    centroids = fit_ivf_centroids(emb, n_clusters=8, seed=42, order_col="vec_id")
    # pin the stamped frame: the self-join's two branches and the final
    # survivor join would otherwise each re-run the 8×64 cell argmin
    cells = emb.withColumn(
        "cell", ivf_cell("embedding", centroids)
    ).localCheckpoint(eager=True)
    losers = (
        semantic_dedup_pairs(cells, "vec_id", "embedding", centroids, cell_col="cell")
        .filter(F.col("cos") >= 0.35)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__lost", F.lit(1))
    )
    return (
        cells.join(losers, "vec_id", "left")
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count("__lost").alias("n_dropped"),
            F.sum(F.when(F.col("__lost").isNull(), F.col("vec_id"))).alias(
                "survivor_id_sum"
            ),
        )
        .select(
            "cell",
            "n_vecs",
            (F.col("n_vecs") - F.col("n_dropped")).alias("n_survivors"),
            "n_dropped",
            "survivor_id_sum",
        )
        .orderBy("cell")
    )


def _semantic_dedup_oracle_sql() -> str:
    """DuckDB mirror of emb_semantic_dedup (lazy — centroid literals are
    fit from the gate data): cell assignment via ``_sql_centroid_dists``
    argmin, same-cell self-join, round-6 cosine with the zero-norm
    guard, keep-smallest-id survivors, per-cell rollup."""
    centroids, con, _ = _fit_oracle_centroids(8, seed=42)
    con.close()
    dists = _sql_centroid_dists(centroids)
    return f"""
    WITH cells AS (
      SELECT vec_id, embedding,
             CAST(list_position(d, list_min(d)) - 1 AS INT) AS cell
      FROM (SELECT vec_id, embedding, {dists} AS d FROM embeddings)),
    pairs AS (
      SELECT b.vec_id AS ib,
             round(CASE
               WHEN list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])
                    * list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) = 0
               THEN 0.0
               ELSE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
             END, 6) AS cos
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id),
    losers AS (SELECT DISTINCT ib AS vec_id FROM pairs WHERE cos >= 0.35)
    SELECT cell,
           count(*) AS n_vecs,
           count(*) - count(l.vec_id) AS n_survivors,
           count(l.vec_id) AS n_dropped,
           CAST(sum(CASE WHEN l.vec_id IS NULL THEN c.vec_id END) AS BIGINT)
             AS survivor_id_sum
    FROM cells c LEFT JOIN losers l USING (vec_id)
    GROUP BY cell ORDER BY cell
    """


oracle("emb_semantic_dedup", _semantic_dedup_oracle_sql)


# ---------------------------------------------------------------------------
# embeddings: ANN recall gates — similarity search as a MEASURED component
# ---------------------------------------------------------------------------


def _recall_pairs(emb: DataFrame, q: DataFrame, extra: dict[str, Column]) -> DataFrame:
    """Scored query×corpus pairs shared by both recall queries: cross-join
    the broadcast O(1)-row query side, drop self-pairs, score cosine, and
    attach each caller's candidate marker (Hamming radius / probed cell).
    Returned UN-checkpointed so tests can assert the join strategy
    (broadcast, never CartesianProduct); callers localCheckpoint the
    result before fanning it into the window branches."""
    v = _as_double(F.col("embedding"))
    cos = _dot(v, F.col("qv")) / (
        F.sqrt(_dot(v, v)) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cos, 6).alias("cos_sim"),
            *[c.alias(name) for name, c in extra.items()],
        )
    )


# (emb_ann_recall rotated out of the gate in r13 to make room for
# events_funnel_levels — the ANN family stays gated via
# emb_ann_ivf_stored, emb_pq_recall, and emb_knn_join_recall, which
# cover the same hyperplane/quantizer kernels, recall scoring, and
# window-ranked ground truth; still cross-engine-checked every round
# through plans/parity_extras.py)
def emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of multi-probe hyperplane-LSH ANN against the exact
    cosine top-10, for 5 query vectors × probe radii Hamming ≤ {1, 2} at
    once — the multi-probe knob's recall/scan trade-off is itself the
    measured, oracle-checked value (radius 2 probes ~14% of buckets vs
    ~3.5% at radius 1 and must never score lower). One distributed pass
    builds all query×candidate pairs (queries broadcast — O(1) rows);
    window ranks produce ground truth and per-radius ANN lists; a left
    join scores overlap. The oracle replays the ENTIRE path — buckets,
    Hamming probe, exact ranking — in SQL from the same hyperplane
    constants. Low absolute recall here is a property of the isotropic
    synthetic vectors (hyperplane LSH's worst case), which is exactly why
    the number is pinned rather than assumed."""
    from pyspark.sql import Window

    emb = _spread(spark, _t(spark, sf_dir, "embeddings")).withColumn(
        "bucket", _bucket_col()
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        _as_double(F.col("embedding")).alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    pairs = _recall_pairs(
        emb,
        q,
        {"ham": F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket")))},
    ).localCheckpoint(eager=True)  # scored pairs feed every window branch
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    gt = (
        pairs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 10)
        .select("qid", "vec_id")
        .crossJoin(spark.range(1, 3).select(F.col("id").cast("int").alias("probe_hamming")))
    )
    wp = Window.partitionBy("qid", "probe_hamming").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    ann = (
        pairs.crossJoin(
            spark.range(1, 3).select(F.col("id").cast("int").alias("probe_hamming"))
        )
        .filter(F.col("ham") <= F.col("probe_hamming"))
        .withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= 10)
        .select("qid", "probe_hamming", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        gt.join(ann, ["qid", "probe_hamming", "vec_id"], "left")
        .groupBy("qid", "probe_hamming")
        .agg(
            F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0))) / 10.0, 2).alias(
                "recall_at_10"
            )
        )
        .orderBy("qid", "probe_hamming")
    )


SQL_EMB_ANN_RECALL = f"""
    WITH b AS (SELECT vec_id, embedding, {_sql_bucket()} AS bucket FROM embeddings),
         q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv, bucket AS qbucket
               FROM b WHERE vec_id < 5),
         radii AS (SELECT unnest([1, 2]) AS probe_hamming),
         pairs AS (
           SELECT qid, vec_id,
                  round(list_dot_product(embedding::DOUBLE[], qv)
                        / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                           * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim,
                  bit_count(xor(bucket, qbucket)) AS ham
           FROM b CROSS JOIN q WHERE vec_id <> qid),
         gt AS (SELECT qid, probe_hamming, vec_id FROM
                  (SELECT qid, vec_id,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY cos_sim DESC, vec_id) AS r
                   FROM pairs) CROSS JOIN radii WHERE r <= 10),
         ann AS (SELECT qid, probe_hamming, vec_id, 1 AS hit FROM
                  (SELECT qid, probe_hamming, vec_id,
                          row_number() OVER (PARTITION BY qid, probe_hamming
                                             ORDER BY cos_sim DESC, vec_id) AS r
                   FROM pairs CROSS JOIN radii WHERE ham <= probe_hamming)
                 WHERE r <= 10)
    SELECT qid, probe_hamming, round(sum(coalesce(hit, 0)) / 10.0, 2) AS recall_at_10
    FROM gt LEFT JOIN ann USING (qid, probe_hamming, vec_id)
    GROUP BY qid, probe_hamming ORDER BY qid, probe_hamming
    """


# (emb_ann_ivf_recall rotated out of the gate in r9 to make room for
# emb_ann_ivf_stored — the stored-index variant exercises the same
# quantizer, probe sets, and ranking PLUS the ingest-time cell stamp and
# partition-pruned scan; the recall formulation keeps driver-grade
# DuckDB parity in plans/parity_extras.py)
def emb_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of IVF ANN (seeded NumPy-Lloyd's coarse quantizer,
    probe the 2 nearest of 8 cells) against the exact cosine top-10,
    same join-based scoring as emb_ann_recall — one distributed pass for
    all 5 queries; only the 5 query vectors and the 8 centroids touch
    the driver.

    Oracle-gated: the quantizer sample is DETERMINISTIC (order by vec_id
    before the 4096-row limit), so ``_ivf_oracle_sql`` below re-fits the
    identical centroids from the same parquet through the same
    ``lloyd_kmeans`` code and inlines them as DuckDB literals — the cell
    assignment, probe set, and ranking all replay in SQL."""
    from pyspark.sql import Window

    from etl_instagram_spark.operators.similarity import (
        _nearest_centroids,
        fit_ivf_centroids,
        ivf_cell,
    )

    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    centroids = fit_ivf_centroids(
        emb, n_clusters=8, seed=42, order_col="vec_id"
    )
    qrows = sorted(
        emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )  # 5 rows — the broadcast-one-query-vector pattern, O(1) driver bytes
    q = spark.createDataFrame(
        [
            (
                int(r["vec_id"]),
                [float(x) for x in r["embedding"]],
                _nearest_centroids([float(x) for x in r["embedding"]], centroids, 2),
            )
            for r in qrows
        ],
        "qid long, qv array<double>, qcells array<int>",
    )
    cells = emb.withColumn("cell", ivf_cell("embedding", centroids))
    pairs = _recall_pairs(
        cells,
        q,
        {"probed": F.array_contains(F.col("qcells"), F.col("cell"))},
    ).localCheckpoint(eager=True)  # one evaluation of the cell-assignment chain
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    gt = (
        pairs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 10)
        .select("qid", "vec_id")
    )
    ann = (
        pairs.filter(F.col("probed"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 10)
        .select("qid", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        gt.join(ann, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0))) / 10.0, 2).alias(
                "recall_at_10"
            )
        )
        .orderBy("qid")
    )


def _fit_oracle_centroids(n_clusters: int = 8, seed: int = 42):
    """Fit the ORACLE's copy of the gate centroids: read the same
    deterministic sample the Spark side uses (ORDER BY vec_id LIMIT
    4096, float→double is exact) from the gate parquet and run the
    identical seeded ``lloyd_kmeans`` — the literals it yields are
    bit-identical to what the Spark plan carries.

    The correctness gate runs at sf=0.01 by the driver contract; when
    exercising the oracle against another scale, point
    ``SPARK_GRAFT_ORACLE_SF_DIR`` at that directory. Returns
    (centroids, duckdb_connection, parquet_path) so callers can issue
    follow-up probes on the same data before closing."""
    import os

    import duckdb
    import numpy as np

    from etl_instagram_spark.operators.similarity import lloyd_kmeans

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    sample = con.sql(
        f"SELECT embedding::DOUBLE[] AS v FROM '{path}' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 4096"
    ).fetchall()
    centroids = lloyd_kmeans(
        np.asarray([r[0] for r in sample], dtype=np.float64), n_clusters, seed=seed
    )
    return centroids, con, path


def _sql_centroid_dists(centroids: list[list[float]]) -> str:
    """DuckDB expression for the per-row centroid score array — the SAME
    ``similarity.shifted_score_sql`` text the Spark side (``ivf_cell``)
    emits, with only the element accessor swapped (DuckDB 1-based
    ``embedding[i]`` for Spark ``try_element_at``). Identical ``repr``
    literals, identical left-to-right addition order, identical
    ``‖c‖²−2·v·c`` shape → both engines rank by bit-identical IEEE
    doubles, so cross-engine argmin agreement holds by construction on
    ANY data, not just by the measured top-2 margin of the gate data."""
    from etl_instagram_spark.operators.similarity import shifted_score_sql

    def elem(i: int) -> str:
        return f"CAST(embedding[{i}] AS DOUBLE)"

    return (
        "["
        + ", ".join(shifted_score_sql(elem, c) for c in centroids)
        + "]"
    )


def _ivf_oracle_sql() -> str:
    """DuckDB mirror of emb_ann_ivf_recall, built LAZILY (resolved at
    ``all_oracle_sql()`` time, not import time) because its literals are
    FIT from the gate data (``_fit_oracle_centroids``), the way
    ``_sql_bucket()`` inlines the hyperplane constants. Cell assignment
    replays as argmin over a distance array (``_sql_centroid_dists``);
    the per-query probe sets come from the same ``_nearest_centroids``
    code and inline as a VALUES list."""
    from etl_instagram_spark.operators.similarity import _nearest_centroids

    centroids, con, path = _fit_oracle_centroids(8, seed=42)
    qrows = con.sql(
        f"SELECT vec_id, embedding::DOUBLE[] FROM '{path}' "
        "WHERE vec_id < 5 ORDER BY vec_id"
    ).fetchall()
    con.close()
    probes = {
        int(qid): _nearest_centroids([float(x) for x in qv], centroids, 2)
        for qid, qv in qrows
    }
    dists = _sql_centroid_dists(centroids)
    qvals = ", ".join(
        f"({qid}, [{', '.join(str(c) for c in cells)}]::INT[])"
        for qid, cells in sorted(probes.items())
    )
    return f"""
    WITH cells AS (
      SELECT vec_id, embedding, (list_position(d, list_min(d)) - 1) AS cell
      FROM (SELECT vec_id, embedding, {dists} AS d FROM embeddings)),
    q AS (
      SELECT e.vec_id AS qid, e.embedding::DOUBLE[] AS qv, p.qcells
      FROM (VALUES {qvals}) p(qid, qcells)
      JOIN embeddings e ON e.vec_id = p.qid),
    pairs AS (
      SELECT qid, vec_id,
             round(list_dot_product(embedding::DOUBLE[], qv)
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim,
             list_contains(qcells, cell) AS probed
      FROM cells CROSS JOIN q WHERE vec_id <> qid),
    gt AS (SELECT qid, vec_id FROM
             (SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY cos_sim DESC, vec_id) AS r
              FROM pairs)
           WHERE r <= 10),
    ann AS (SELECT qid, vec_id, 1 AS hit FROM
             (SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY cos_sim DESC, vec_id) AS r
              FROM pairs WHERE probed)
            WHERE r <= 10)
    SELECT qid, round(sum(coalesce(hit, 0)) / 10.0, 2) AS recall_at_10
    FROM gt LEFT JOIN ann USING (qid, vec_id)
    GROUP BY qid ORDER BY qid
    """


@query("emb_ann_ivf_stored")
def emb_ann_ivf_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a STORED, partition-pruned index — the 100-TB
    serving path exercised end-to-end at the gate: stamp ``ivf_cell`` at
    ingest, write the index ``partitionBy("cell")``, then answer 5
    queries via :func:`ann_ivf_topk` with ``cell_col`` set, so the probe
    filter is plain partition-column equality and the scan physically
    reads only the n_probe/n_clusters probed directories (pruning pinned
    by test_plan_invariants.test_ivf_stored_cell_scan_prunes_partitions).
    Until r9 this path was certified by pytest only; the recall-shaped
    gate rows recompute the cell per row and scan everything.

    Oracle-gated: the quantizer replays exactly as in
    ``_ivf_oracle_sql`` (same seeded fit, same shifted-score text), the
    probe sets inline as VALUES, and DuckDB re-ranks the probed cells by
    the same 6-dp cosine — top-10 ids and scores match by construction.
    Returns (qid, vec_id, cos_sim): 50 rows."""
    import os
    import tempfile

    from etl_instagram_spark.operators.similarity import (
        _nearest_centroids,
        ann_ivf_topk,
        fit_ivf_centroids,
        ivf_cell,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centroids = fit_ivf_centroids(
        emb, n_clusters=8, seed=42, order_col="vec_id"
    )
    # ingest: cell stamped once, index laid out for pruning (overwrite —
    # the write IS the measured ingest cost, and reruns stay hermetic)
    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_ivf_index_{sf_tag}"
    )
    (
        emb.select("vec_id", "embedding")
        .withColumn("cell", ivf_cell("embedding", centroids))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    index = spark.read.parquet(path)
    qrows = sorted(
        emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )  # 5 query vectors — O(1) driver bytes
    out = None
    for r in qrows:
        qv = [float(x) for x in r["embedding"]]
        topk = ann_ivf_topk(
            index, qv, centroids, k=10, n_probe=2, cell_col="cell"
        ).withColumn("qid", F.lit(int(r["vec_id"])))
        out = topk if out is None else out.unionByName(topk)
    return out.select("qid", "vec_id", "cos_sim").orderBy(
        "qid", F.col("cos_sim").desc(), "vec_id"
    )


def _ivf_stored_oracle_sql() -> str:
    """DuckDB mirror of emb_ann_ivf_stored (lazy — centroids fit from
    the gate data): assign cells with the shared shifted-score text,
    keep only each query's probed cells, rank by the same rounded
    cosine. A stored cell equals a computed cell by construction, so the
    mirror needs no materialized index."""
    from etl_instagram_spark.operators.similarity import _nearest_centroids

    centroids, con, path = _fit_oracle_centroids(8, seed=42)
    qrows = con.sql(
        f"SELECT vec_id, embedding::DOUBLE[] FROM '{path}' "
        "WHERE vec_id < 5 ORDER BY vec_id"
    ).fetchall()
    con.close()
    probes = {
        int(qid): _nearest_centroids([float(x) for x in qv], centroids, 2)
        for qid, qv in qrows
    }
    dists = _sql_centroid_dists(centroids)
    qvals = ", ".join(
        f"({qid}, [{', '.join(str(c) for c in cells)}]::INT[])"
        for qid, cells in sorted(probes.items())
    )
    return f"""
    WITH cells AS (
      SELECT vec_id, embedding, (list_position(d, list_min(d)) - 1) AS cell
      FROM (SELECT vec_id, embedding, {dists} AS d FROM embeddings)),
    q AS (
      SELECT e.vec_id AS qid, e.embedding::DOUBLE[] AS qv, p.qcells
      FROM (VALUES {qvals}) p(qid, qcells)
      JOIN embeddings e ON e.vec_id = p.qid),
    pairs AS (
      SELECT qid, vec_id,
             round(list_dot_product(embedding::DOUBLE[], qv)
                   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                      * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
      FROM cells JOIN q ON list_contains(qcells, cell))
    SELECT qid, vec_id, cos_sim FROM (
      SELECT qid, vec_id, cos_sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id) AS r
      FROM pairs)
    WHERE r <= 10
    ORDER BY qid, cos_sim DESC, vec_id
    """


oracle("emb_ann_ivf_stored", _ivf_stored_oracle_sql)


_PQ_M, _PQ_K = 8, 16  # shared by the Spark query and its oracle builder


@query("emb_pq_recall")
def emb_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of product-quantization ADC ranking (m=8 subspaces ×
    k=16 centroids, Jégou et al. 2011) against the exact L2 top-10, for
    5 query vectors in one distributed pass.

    The compressed-domain rank is the MEASURED value: every row is
    scored from its m-int PQ code and the query's lookup table alone
    (``pq_adc_dist`` — m array lookups, fixed-order adds, bit-identical
    on both engines since the LUT floats are Python-computed literals);
    the raw embedding feeds only the ground-truth side. Codebooks are
    deterministic (sort-before-sample, ``pq_codebooks_from_sample``), so
    ``_pq_oracle_sql`` refits identical literals and replays encode →
    ADC → rank in DuckDB."""
    from pyspark.sql import Window

    from etl_instagram_spark.operators.similarity import (
        fit_pq_codebooks,
        pq_adc_dist,
        pq_code,
        pq_lut,
    )

    emb = _spread(spark, _t(spark, sf_dir, "embeddings"))
    cbs = fit_pq_codebooks(
        emb, m=_PQ_M, k=_PQ_K, seed=42, order_col="vec_id"
    )
    qrows = sorted(
        emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )  # 5 rows — O(1) driver bytes, broadcast back as the query side
    q = spark.createDataFrame(
        [
            (
                int(r["vec_id"]),
                [float(x) for x in r["embedding"]],
                pq_lut([float(x) for x in r["embedding"]], cbs),
            )
            for r in qrows
        ],
        "qid long, qv array<double>, lut array<double>",
    )
    # pin the encoded corpus BEFORE the query cross-join: the encode
    # expression (m·k interpreted HOF aggregates per row) must evaluate
    # once per corpus row, not once per (row × query) pair
    coded = emb.withColumn("code", pq_code("embedding", cbs)).localCheckpoint(
        eager=True
    )
    v = _as_double(F.col("embedding"))
    l2sq = F.aggregate(
        F.zip_with(v, F.col("qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        coded.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(F.sqrt(l2sq), 6).alias("dist"),
            pq_adc_dist(F.col("code"), F.col("lut"), _PQ_M, _PQ_K).alias("adc"),
        )
        .localCheckpoint(eager=True)  # one evaluation of the encode chain
    )
    w_gt = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("vec_id"))
    w_adc = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("vec_id"))
    gt = (
        pairs.withColumn("r", F.row_number().over(w_gt))
        .filter(F.col("r") <= 10)
        .select("qid", "vec_id")
    )
    ann = (
        pairs.withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= 10)
        .select("qid", "vec_id", F.lit(1).alias("hit"))
    )
    return (
        gt.join(ann, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0))) / 10.0, 2).alias(
                "recall_at_10"
            )
        )
        .orderBy("qid")
    )


def _pq_oracle_sql() -> str:
    """DuckDB mirror of emb_pq_recall (lazy — codebooks and LUTs are fit
    from the gate data through the same ``pq_codebooks_from_sample`` /
    ``pq_lut`` code the Spark side runs, then inlined as literals).
    Per-subspace encode replays the SAME ``shifted_score_sql`` text as
    Spark's ``pq_code`` (only the element accessor differs), so both
    engines rank by bit-identical doubles and the code assignment agrees
    by construction on any data. The ADC sum indexes the same LUT
    literals left-to-right, so it is bit-identical too."""
    import os

    import duckdb
    import numpy as np

    from etl_instagram_spark.operators.similarity import (
        pq_codebooks_from_sample,
        pq_lut,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    sample = con.sql(
        f"SELECT embedding::DOUBLE[] AS v FROM '{path}' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 4096"
    ).fetchall()
    cbs = pq_codebooks_from_sample(
        np.asarray([r[0] for r in sample], dtype=np.float64), m=_PQ_M, k=_PQ_K, seed=42
    )
    qrows = con.sql(
        f"SELECT vec_id, embedding::DOUBLE[] FROM '{path}' "
        "WHERE vec_id < 5 ORDER BY vec_id"
    ).fetchall()
    con.close()
    from etl_instagram_spark.operators.similarity import shifted_score_sql

    def elem(i: int) -> str:
        return f"CAST(embedding[{i}] AS DOUBLE)"

    ds = len(cbs[0][0])
    sub_dists = []
    for j, book in enumerate(cbs):
        arr = ", ".join(
            shifted_score_sql(elem, c, offset=j * ds) for c in book
        )
        sub_dists.append(f"[{arr}] AS d{j}")
    code_cols = ", ".join(
        f"(list_position(d{j}, list_min(d{j})) - 1) AS c{j}" for j in range(_PQ_M)
    )
    adc = " + ".join(f"lut[{j * _PQ_K} + c{j} + 1]" for j in range(_PQ_M))
    qvals = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            int(qid),
            ", ".join(repr(float(x)) for x in pq_lut([float(v) for v in qv], cbs)),
        )
        for qid, qv in qrows
    )
    return f"""
    WITH sub AS (SELECT vec_id, embedding, {", ".join(sub_dists)} FROM embeddings),
    codes AS (SELECT vec_id, embedding, {code_cols} FROM sub),
    q AS (
      SELECT p.qid, e.embedding::DOUBLE[] AS qv, p.lut
      FROM (VALUES {qvals}) p(qid, lut)
      JOIN embeddings e ON e.vec_id = p.qid),
    pairs AS (
      SELECT qid, vec_id,
             round(list_distance(embedding::DOUBLE[], qv), 6) AS dist,
             {adc} AS adc
      FROM codes CROSS JOIN q WHERE vec_id <> qid),
    gt AS (SELECT qid, vec_id FROM
             (SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY dist ASC, vec_id) AS r
              FROM pairs)
           WHERE r <= 10),
    ann AS (SELECT qid, vec_id, 1 AS hit FROM
             (SELECT qid, vec_id,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY adc ASC, vec_id) AS r
              FROM pairs)
            WHERE r <= 10)
    SELECT qid, round(sum(coalesce(hit, 0)) / 10.0, 2) AS recall_at_10
    FROM gt LEFT JOIN ann USING (qid, vec_id)
    GROUP BY qid ORDER BY qid
    """


oracle("emb_pq_recall", _pq_oracle_sql)


# ---------------------------------------------------------------------------
# documents: top terms per language (the unstemmed topics path, F3/F5/F7)
# ---------------------------------------------------------------------------


@query("docs_top_terms_by_lang")
def docs_top_terms_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies: normalize → stopword/short/url drop →
    explode → count per (lang, term) → top-5 per lang (window rank, ties
    by term). The oracle-checkable core of the topics kernel (stemming
    excluded — Porter has no SQL mirror; it is golden-tested instead)."""
    from pyspark.sql import Window

    from etl_instagram_spark.enrich.topics import drop_stop_tokens, normalized_tokens

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    terms = docs.select(
        "lang",
        F.explode(drop_stop_tokens(normalized_tokens(F.col("text")), langs=("en",))).alias("term"),
    )
    counts = terms.groupBy("lang", "term").agg(F.count("*").alias("n_occurrences"))
    w = Window.partitionBy("lang").orderBy(F.col("n_occurrences").desc(), F.col("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("lang", "rank")
    )


def _sql_stop_drop_predicate() -> str:
    """The keep-predicate for token filtering, generated from the same
    stopword constants + drop rule as the Spark side (enrich/topics.py)."""
    from etl_instagram_spark.enrich.topics import stop_drop_sql_predicate

    return stop_drop_sql_predicate("t", langs=("en",))


oracle(
    "docs_top_terms_by_lang",
    f"""
    WITH toks AS (
      SELECT lang,
             list_filter(
               list_transform(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r,"]+'),
                              x -> regexp_replace(lower(x), '[^a-z''A-Z0-9À-ÿ ]+', '', 'g')),
               t -> {_sql_stop_drop_predicate()}) AS terms
      FROM documents),
    flat AS (SELECT lang, unnest(terms) AS term FROM toks),
    counts AS (SELECT lang, term, count(*) AS n_occurrences
               FROM flat GROUP BY lang, term),
    ranked AS (SELECT lang, term, n_occurrences,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY n_occurrences DESC, term) AS rank
               FROM counts)
    SELECT lang, term, n_occurrences, rank
    FROM ranked WHERE rank <= 5 ORDER BY lang, rank
    """,
)


# ---------------------------------------------------------------------------
# lineitem: nested array-of-struct build + higher-order functions (F14/F15)
# ---------------------------------------------------------------------------


@query("orders_nested_lineitems")
def orders_nested_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document round trip: collect lineitems into a sorted
    array<struct>, then read it back with element_at / aggregate /
    transform — the engine's nested data model (SURVEY §1.1) exercised
    against the oracle. One shuffle (the groupBy); every array op is a
    per-row expression."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("l_linenumber").alias("ln"), F.col("l_quantity").alias("qty"))
            )
        ).alias("items")
    )
    return nested.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        F.element_at("items", 1)["qty"].alias("first_qty"),
        F.round(
            F.aggregate("items", F.lit(0.0), lambda acc, x: acc + x["qty"]), 2
        ).alias("total_qty"),
        F.concat_ws(",", F.transform("items", lambda x: x["ln"].cast("string"))).alias(
            "line_numbers"
        ),
    ).orderBy("l_orderkey")


oracle(
    "orders_nested_lineitems",
    """
    WITH nested AS (
      SELECT l_orderkey,
             list(struct_pack(ln := l_linenumber, qty := l_quantity)
                  ORDER BY l_linenumber, l_quantity) AS items
      FROM lineitem WHERE l_orderkey <= 200 GROUP BY l_orderkey)
    SELECT l_orderkey,
           len(items) AS n_items,
           items[1].qty AS first_qty,
           round(list_sum(list_transform(items, x -> x.qty)), 2) AS total_qty,
           array_to_string(list_transform(items, x -> x.ln::VARCHAR), ',') AS line_numbers
    FROM nested ORDER BY l_orderkey
    """,
)


# ---------------------------------------------------------------------------
# events: latest row per entity (the rates latest-per-entity pattern)
# ---------------------------------------------------------------------------


@query("orders_shipments_in_window")
def orders_shipments_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval range join: for a deterministic sample
    of orders (o_orderkey % 97 == 1), count/weigh ALL lineitem shipments
    (any order's) whose ship date falls in the 30 days from that order's
    date — the "events inside a window" primitive behind campaign
    attribution and frame⋈span alignment, with NO equi-key to save the
    join. operators/temporal.range_join turns what Catalyst would run as
    a BroadcastNestedLoopJoin into an equi-join on 30-day time buckets
    (interval side exploded to its ≤2 covered buckets, residual range
    filter after the match) — plan-shape pinned in tests. The retired
    latest-per-entity query this replaces was window-rank coverage that
    top3_orders_per_customer already exercises.

    Partial aggregation is pushed BELOW the range join: window edges are
    day-aligned (order dates and ship dates are midnight timestamps), so
    lineitem collapses to per-day partial sums first — the join input
    shrinks from one row per lineitem to one row per distinct ship DAY
    (~2.5k rows regardless of SF; at 100 TB this is the difference
    between range-joining the fact table and range-joining a calendar).

    (Replaces events_latest_per_user in the 50-query inventory.)"""
    from etl_instagram_spark.operators.temporal import range_join

    day_partials = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_shipdate")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("l_quantity").alias("__qty"),
        )
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 1)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").alias("win_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("win_end"),
        )
    )
    return (
        range_join(
            day_partials, orders, "l_shipdate", "win_start", "win_end", bucket="30 days"
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.sum("__n").alias("n_shipments"),
            F.round(F.sum("__qty"), 2).alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


oracle(
    "orders_shipments_in_window",
    """
    SELECT o_orderkey, o_orderpriority,
           count(*) AS n_shipments,
           round(sum(l_quantity), 2) AS sum_qty
    FROM orders o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
    WHERE o.o_orderkey % 97 = 1
    GROUP BY o_orderkey, o_orderpriority
    ORDER BY o_orderkey
    """,
)


# ---------------------------------------------------------------------------
# part: URL build + parse (F1/F10)
# ---------------------------------------------------------------------------


# (part_url_parse rotated out of the gate in r6 to make room for
# docs_bm25_topk — the F10 parse surface keeps DuckDB parity via
# plans/parity_extras.py and its projection pytest coverage)
def part_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL origin/path/query parsing (F10, elimparcial.js:16 getImageURL
    origin logic) via parse_url — mirrored in the oracle with regexes."""
    pa = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    url = F.concat(
        F.lit("https://cdn.example/"),
        F.lower(F.regexp_replace("p_brand", r"[^A-Za-z0-9]", "")),
        F.lit("/"),
        F.regexp_replace("p_name", " ", "-"),
        F.lit("?size="),
        F.col("p_size").cast("string"),
    )
    return pa.select(
        "p_partkey",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("size")).alias("size_param"),
    ).orderBy("p_partkey")


SQL_PART_URL_PARSE = """
    WITH u AS (
      SELECT p_partkey,
             'https://cdn.example/' || lower(regexp_replace(p_brand, '[^A-Za-z0-9]', '', 'g'))
               || '/' || regexp_replace(p_name, ' ', '-', 'g')
               || '?size=' || p_size::VARCHAR AS url
      FROM part WHERE p_partkey <= 100)
    SELECT p_partkey, url,
           regexp_extract(url, '^https?://([^/]+)', 1) AS host,
           regexp_extract(url, '^https?://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '[?&]size=([^&]*)', 1) AS size_param
    FROM u ORDER BY p_partkey
    """


# ---------------------------------------------------------------------------
# documents: BM25 ranked retrieval (operators/retrieval.py)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "vector", "merge")
_BM25_K1, _BM25_B = 1.2, 0.75


@query("docs_bm25_topk")
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/retrieval.bm25_topk: top-10 docs for a 3-term query at
    the standard (k1=1.2, b=0.75). The oracle replays the IDENTICAL
    fixed-order floating arithmetic (idf·tf·(k1+1)/denom per term,
    summed in query order), so ranks AND 6-place scores value-check —
    tf columns included to pin the per-term counts, not just the sum."""
    from etl_instagram_spark.operators.retrieval import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(
        docs, "doc_id", "text", _BM25_TERMS, k=10, k1=_BM25_K1, b=_BM25_B
    )


def _sql_bm25_topk() -> str:
    k1, b = _BM25_K1, _BM25_B
    tf_defs = ",\n             ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_aggs = ",\n             ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    # literal-for-literal the Spark expression: ((idf * tf) * (k1+1)) /
    # (tf + k1 * ((1-b) + ((b * dl) / avgdl))), summed left-to-right
    terms = " + ".join(
        f"""CASE WHEN tf_{i} > 0 AND avgdl > 0
             THEN ln(1.0 + (n_docs - CAST(df_{i} AS DOUBLE) + 0.5)
                           / (CAST(df_{i} AS DOUBLE) + 0.5))
                  * tf_{i} * {k1 + 1.0}
                  / (tf_{i} + {k1} * ({1.0 - b} + {b} * dl / avgdl))
             ELSE 0.0 END"""
        for i in range(len(_BM25_TERMS))
    )
    tf_cols = ", ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))
    return f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({SQL_TOKS}) END AS dl,
             {tf_defs}
      FROM (SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents)),
    s AS (
      SELECT count(*) AS n_docs,
             coalesce(avg(CAST(dl AS DOUBLE)), 0.0) AS avgdl,
             {df_aggs}
      FROM t),
    sc AS (
      SELECT doc_id, round(0.0 + {terms}, 6) AS score, {tf_cols}
      FROM t CROSS JOIN s)
    SELECT doc_id, score, {tf_cols}
    FROM sc WHERE score > 0
    ORDER BY score DESC, doc_id LIMIT 10
    """


oracle("docs_bm25_topk", _sql_bm25_topk())


# ---------------------------------------------------------------------------
# lineitem: deterministic hash-based sampling (F17's reproducibility)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# supplier: haversine geo distances (SURVEY §1.4 geo surface)
# ---------------------------------------------------------------------------


# (supplier_geo_bands rotated out of the gate in r6 to make room for
# docs_domain_cap — the haversine/trig surface keeps DuckDB parity via
# plans/parity_extras.py; functions/geo.py keeps its pytest coverage)
def supplier_geo_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance bands from synthetic supplier coordinates
    (derived deterministically from the key) to a fixed origin — the geo
    predicate surface the reference's 2dsphere index implies. All trig is
    codegen'd column math; the oracle mirrors the identical formula."""
    from etl_instagram_spark.functions.geo import haversine_km

    su = _t(spark, sf_dir, "supplier")
    lat = (F.col("s_suppkey") % 120) - 60 + F.lit(0.25)
    lng = (F.col("s_suppkey") * 7 % 360) - 180 + F.lit(0.5)
    dist = haversine_km(lat, lng, F.lit(19.43), F.lit(-99.13))  # CDMX origin
    return (
        su.select((F.floor(dist / 2000)).cast("int").alias("band_2000km"))
        .groupBy("band_2000km")
        .agg(F.count("*").alias("n_suppliers"))
        .orderBy("band_2000km")
    )


SQL_SUPPLIER_GEO_BANDS = """
    WITH pts AS (
      SELECT (s_suppkey % 120) - 60 + 0.25 AS lat,
             (s_suppkey * 7 % 360) - 180 + 0.5 AS lng
      FROM supplier),
    d AS (
      SELECT 2 * 6371.0088 * atan2(
               sqrt(   sin(radians(19.43 - lat) / 2) ^ 2
                     + cos(radians(lat)) * cos(radians(19.43))
                       * sin(radians(-99.13 - lng) / 2) ^ 2),
               sqrt(1 - (sin(radians(19.43 - lat) / 2) ^ 2
                     + cos(radians(lat)) * cos(radians(19.43))
                       * sin(radians(-99.13 - lng) / 2) ^ 2))) AS dist
      FROM pts)
    SELECT CAST(floor(dist / 2000) AS INT) AS band_2000km,
           count(*) AS n_suppliers
    FROM d GROUP BY band_2000km ORDER BY band_2000km
    """


# ---------------------------------------------------------------------------
# documents: per-doc top_terms kernel, flattened for the oracle
# ---------------------------------------------------------------------------


# (docs_top_terms_per_doc rotated out of the gate in r6 — the identical
# stemmer/stopword/top-terms path stays gated via docs_top_terms_by_lang;
# the per-doc shape keeps DuckDB parity in plans/parity_extras.py)


# ---------------------------------------------------------------------------
# orders: intersect / cube set-op + grouping surface
# ---------------------------------------------------------------------------


# (INTERSECT / EXCEPT / EXCEPT ALL are exercised — value-checked via
# per-operator checksums — by orders_set_ops in plans/queries.py)


@query("cube_returnflag_status")
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all grouping-set combinations
    in one pass (Catalyst Expand — one shuffle regardless of the number
    of grouping sets)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


oracle(
    "cube_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
)


# ---------------------------------------------------------------------------
# documents: the FULL near-dedup operator, end-to-end against the oracle
# ---------------------------------------------------------------------------


@query("docs_near_dedup_summary")
def docs_near_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.near_dedup_minhash run whole: LSH candidates →
    exact shingle-Jaccard verify (≥0.5) → drop-larger-id survivors. The
    oracle replays every stage in SQL, so this is an end-to-end gate on
    the dedup operator, not just its kernels.

    Single action: the drop set joins back to the docs scan and one
    aggregate produces all three counters (previously two .count()
    actions re-ran the whole pipeline)."""
    from etl_instagram_spark.operators.dedup import near_dedup_losers

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    losers = near_dedup_losers(
        docs, "doc_id", "text", threshold=0.5, k=MINHASH_K, bands=MINHASH_BANDS
    ).withColumn("__dropped", F.lit(1))
    return (
        docs.join(losers, "doc_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("__dropped").alias("n_dropped"),
        )
        .select(
            "n_docs",
            (F.col("n_docs") - F.col("n_dropped")).alias("n_survivors"),
            "n_dropped",
        )
    )


def _sql_verified_pairs() -> str:
    """WITH-body replaying the MinHash-LSH candidate → exact-Jaccard
    verify pipeline (operators/dedup.verified_duplicate_pairs) at
    threshold 0.5 — the final CTE is ``verified`` (ia, ib with ia < ib).
    Shared by the near-dedup-summary and dup-cluster-reps oracles so the
    two mirrors can never drift."""
    return f"""
    t AS (SELECT doc_id, trim(lower(text)) AS norm, {SQL_TOKS} AS toks
               FROM documents),
         s AS (SELECT doc_id,
                      CASE WHEN len(toks) < 3 THEN [norm]
                           ELSE [array_to_string(toks[i:i+2], ' ')
                                 for i in range(1, len(toks) - 1)] END AS sh
               FROM t),
         h AS (SELECT doc_id,
                      list_transform(sh, s -> {T.hash32_sql('s')}) AS hs,
                      list_distinct(sh) AS dsh
               FROM s),
         sig AS (SELECT doc_id, dsh, {_sql_minhash_sig()} AS sig FROM h),
         bharr AS (SELECT doc_id, {_sql_band_hashes()} AS bh FROM sig),
         bands AS (SELECT doc_id, u.j AS band_idx, bh[u.j + 1] AS bh
                   FROM bharr CROSS JOIN (SELECT unnest(range({MINHASH_BANDS})) AS j) u),
         pairs AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                   FROM bands a JOIN bands b
                     ON a.band_idx = b.band_idx AND a.bh = b.bh
                        AND a.doc_id < b.doc_id),
         verified AS (SELECT ia, ib
                      FROM pairs
                      JOIN sig sa ON sa.doc_id = ia
                      JOIN sig sb ON sb.doc_id = ib
                      WHERE len(list_intersect(sa.dsh, sb.dsh))::DOUBLE
                            / len(list_distinct(sa.dsh || sb.dsh)) >= 0.5)"""


oracle(
    "docs_near_dedup_summary",
    f"""
    WITH {_sql_verified_pairs()},
         losers AS (SELECT DISTINCT ib FROM verified)
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           (SELECT count(*) FROM documents) - (SELECT count(*) FROM losers) AS n_survivors,
           (SELECT count(*) FROM losers) AS n_dropped
    """,
)


# ---------------------------------------------------------------------------
# events: exact percentiles per event type
# ---------------------------------------------------------------------------


@query("events_value_percentiles")
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles of value per event_type
    (F.percentile — matches DuckDB quantile_cont). At scale swap for
    percentile_approx (t-digest, mergeable, one pass) — the exact form
    is the correctness oracle for that approximation."""
    ev = _t(spark, sf_dir, "events")
    pcts = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(pcts[0], 4).alias("p50"),
            F.round(pcts[1], 4).alias("p90"),
            F.round(pcts[2], 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


oracle(
    "events_value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.9), 4)  AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)


# ---------------------------------------------------------------------------
# documents: simhash values (oracle mirrors the bit-vote construction)
# ---------------------------------------------------------------------------


def _sql_simhash32(hs_expr: str) -> str:
    """32-bit SimHash in SQL: bit j set iff Σ_tokens ((h>>j)&1)*2-1 > 0.
    Generated per-bit from the same definition as text._simhash32_from."""
    bits = [
        f"(CASE WHEN list_sum(list_transform({hs_expr}, "
        f"h -> ((h >> {j}) & 1) * 2 - 1)) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(32)
    ]
    return "(" + " + ".join(bits) + ")"


# (docs_simhash rotated out of the gate in r13 to make room for
# events_cm_frequency — the near-dup family stays gated via
# docs_near_dedup_summary and emb_near_dedup (docs_ngram_jaccard until
# its own r14 rotation), and the per-row hash-expression shape via
# docs_fingerprint_profile; still cross-engine-checked every round
# through plans/parity_extras.py)
def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash values for the first 100 docs — near-identical docs differ
    in few bits (docs_minhash_bands' sibling signal; pairing strategy
    lives in operators/dedup.simhash_candidates). Per-row expression,
    zero shuffle."""
    docs = _spread(spark, _t(spark, sf_dir, "documents")).filter(F.col("doc_id") < 100)
    staged = docs.withColumn("sim", T.simhash(F.col("text")))
    return staged.select(
        "doc_id",
        F.element_at("sim", 1).alias("sim_lo"),
        F.element_at("sim", 2).alias("sim_hi"),
    ).orderBy("doc_id")


SQL_DOCS_SIMHASH = f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks
               FROM documents WHERE doc_id < 100),
         h AS (SELECT doc_id,
                      list_transform(toks, x -> {T.hash32_sql('x')}) AS lo_h,
                      list_transform(toks, x -> {T.hash32_sql("('s1:' || x)")}) AS hi_h
               FROM t)
    SELECT doc_id,
           {_sql_simhash32('lo_h')} AS sim_lo,
           {_sql_simhash32('hi_h')} AS sim_hi
    FROM h ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# shared-SQL query: the engine's spark.sql surface, one SQL text both sides
# ---------------------------------------------------------------------------

_SHARED_SQL_BRAND_REVENUE = f"""
    SELECT p.p_brand AS brand,
           count(*) AS n_items,
           {sql_revenue_dec("l.")}
             AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    GROUP BY p.p_brand
    ORDER BY brand
"""


@query("sql_brand_revenue")
def sql_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door: register the test tables as temp
    views and run the EXACT same ANSI text the oracle runs — one string,
    two engines. Catalyst's planning (broadcast part-side, partial agg)
    is identical to the DataFrame version of this query."""
    from etl_instagram_spark.sources.tables import register_views

    register_views(spark, sf_dir, names=("part", "lineitem"))
    return spark.sql(_SHARED_SQL_BRAND_REVENUE)


oracle("sql_brand_revenue", _SHARED_SQL_BRAND_REVENUE)


# ---------------------------------------------------------------------------
# events: native session_window (batch) vs gaps-and-islands oracle
# ---------------------------------------------------------------------------


@query("events_session_window_native")
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) in BATCH mode — the same
    operator Structured Streaming uses for session state, so batch and
    stream agree by construction. One shuffle on user_id; session merge
    happens inside the aggregation."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


oracle(
    "events_session_window_native",
    """
    WITH o AS (
      SELECT user_id, ts::TIMESTAMP AS ts, value,
             lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP) AS prev
      FROM events),
    m AS (SELECT *,
                 -- Spark's session window end is exclusive: a gap of
                 -- exactly 30min starts a new session
                 CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM o),
    s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)


# ---------------------------------------------------------------------------
# documents ⋈ embeddings: cross-modal quality/label profile
# ---------------------------------------------------------------------------


@query("docs_emb_crossmodal")
def docs_emb_crossmodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join the text and vector modalities (doc_id = vec_id): per
    embedding label, doc count, mean text-quality score, mean vector
    norm. The canonical training-data audit — 'are low-quality docs
    clustered in embedding space?'. Equi-join on the id; at scale both
    tables are bucketed by id so the join is co-located."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    joined = docs.withColumn("q", T.quality_score(F.col("text"))).join(
        emb.withColumn("nrm", F.sqrt(dot)), docs["doc_id"] == emb["vec_id"]
    )
    return (
        joined.groupBy("label")
        .agg(
            F.count("*").alias("n_docs"),
            # q is a 4dp-rounded score: recover the exact grid value with
            # a DECIMAL cast and sum exactly, so the re-rounded mean can't
            # sit on a summation-order tie (the docs_pack_cumsum class);
            # nrm (a sqrt) is not grid-aligned, so a tie there has
            # measure zero and plain avg is fine
            F.round(
                F.sum(F.col("q").cast("decimal(14,4)")).cast("double") / F.count("*"),
                4,
            ).alias("avg_quality"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
        .orderBy("label")
    )


oracle(
    "docs_emb_crossmodal",
    f"""
    WITH dq AS (
      SELECT doc_id, q FROM (
        SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents
      ) t CROSS JOIN LATERAL (SELECT {_SQL_QUALITY} AS q) s),
    en AS (
      SELECT vec_id, label,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings)
    SELECT label,
           count(*) AS n_docs,
           round(CAST(sum(CAST(q AS DECIMAL(14,4))) AS DOUBLE) / count(*), 4)
             AS avg_quality,
           round(avg(nrm), 4) AS avg_norm
    FROM dq JOIN en ON dq.doc_id = en.vec_id
    GROUP BY label ORDER BY label
    """,
)


# ---------------------------------------------------------------------------
# relational round-out: listagg, EXCEPT ALL, unpivot, full outer
# ---------------------------------------------------------------------------


def nation_customer_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation: first five customer names per nation,
    deterministically sorted then joined — the listagg surface.
    (r10 rotation: gate seat given to graph_pagerank_suppliers; this
    keeps driver-grade DuckDB parity in plans/parity_extras.py, and
    collect_list/sort_array stays gated via docs_top_terms_by_lang.)"""
    cu = _t(spark, sf_dir, "customer")
    return (
        cu.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.concat_ws(
                ",", F.slice(F.sort_array(F.collect_list("c_name")), 1, 5)
            ).alias("first_names"),
        )
        .orderBy("c_nationkey")
    )


SQL_NATION_CUSTOMER_LISTAGG = """
    SELECT c_nationkey,
           count(*) AS n_customers,
           array_to_string((list(c_name ORDER BY c_name))[1:5], ',') AS first_names
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """


def part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): per-part numeric metrics as (metric, value)
    rows — Catalyst Expand, one pass, no shuffle.
    (r10 rotation: gate seat given to docs_leakage_safe_split; DuckDB
    parity retained in plans/parity_extras.py.)"""
    pa = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return (
        pa.select(
            "p_partkey",
            F.col("p_retailprice").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
        .unpivot("p_partkey", ["retailprice", "size"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


SQL_PART_METRICS_UNPIVOT = """
    SELECT p_partkey, metric, value
    FROM (SELECT p_partkey,
                 p_retailprice AS retailprice,
                 p_size::DOUBLE AS size
          FROM part WHERE p_partkey <= 100)
    UNPIVOT (value FOR metric IN (retailprice, size))
    ORDER BY p_partkey, metric
    """


@query("nation_customers_suppliers_full")
def nation_customers_suppliers_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER between two aggregates: nations ranked by customer and
    supplier counts, keeping nations present on either side only."""
    cu = _t(spark, sf_dir, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_customers")
    )
    su = _t(spark, sf_dir, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_suppliers")
    )
    return (
        cu.join(su, on="nk", how="full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


oracle(
    "nation_customers_suppliers_full",
    """
    WITH cu AS (SELECT c_nationkey AS nk, count(*) AS n_customers
                FROM customer GROUP BY c_nationkey),
         su AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cu.nk, su.nk) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM cu FULL OUTER JOIN su ON cu.nk = su.nk
    ORDER BY nationkey
    """,
)


# ---------------------------------------------------------------------------
# window-frame variants: RANGE rolling window, ntile quartiles
# ---------------------------------------------------------------------------


@query("customer_rolling_30d_revenue")
def customer_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling window: per customer, revenue in the 30 days
    up to each order (value-based frame, not row-based — late/sparse
    orders widen correctly). Partitioned by the high-cardinality customer
    key; frame state is bounded by the 30-day horizon."""
    from pyspark.sql import Window

    od = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    day_num = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num)
        .rangeBetween(-30, Window.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        day_num.alias("day_num"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_30d_revenue"),
    ).orderBy("o_custkey", "day_num", "o_orderkey")


oracle(
    "customer_rolling_30d_revenue",
    """
    SELECT o_custkey, o_orderkey,
           datediff('day', DATE '1992-01-01', o_orderdate::DATE) AS day_num,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1992-01-01', o_orderdate::DATE)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rolling_30d_revenue
    FROM orders WHERE o_custkey <= 100
    ORDER BY o_custkey, day_num, o_orderkey
    """,
)


# (customer_revenue_quartiles rotated out of the gate in r11 to make room
# for part_entity_resolution — the percentile-boundary-broadcast shape
# stays gated via events_value_percentiles, and bucketed top-k via
# docs_bm25_topk; still cross-engine-checked every round through
# plans/parity_extras.py)
def customer_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue quartiles the scale-correct way: percentile BOUNDARIES
    (one tiny aggregate) broadcast into a CASE bucket assignment — no
    global ntile window, which would funnel every row through a single
    partition (WindowExec warns exactly that). Same two-pass shape at
    any scale; swap percentile→percentile_approx for one-pass sketches."""
    od = _t(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    pcts = F.percentile("revenue", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    bounds = per_cust.agg(
        pcts[0].alias("b1"), pcts[1].alias("b2"), pcts[2].alias("b3")
    )
    quartile = (
        F.when(F.col("revenue") <= F.col("b1"), 1)
        .when(F.col("revenue") <= F.col("b2"), 2)
        .when(F.col("revenue") <= F.col("b3"), 3)
        .otherwise(4)
    )
    return (
        per_cust.crossJoin(F.broadcast(bounds))
        .select(quartile.alias("quartile"), "revenue")
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("revenue"), 2).alias("min_revenue"),
            F.round(F.max("revenue"), 2).alias("max_revenue"),
        )
        .orderBy("quartile")
    )


SQL_CUSTOMER_REVENUE_QUARTILES = (
    """
    WITH per_cust AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_custkey),
    bounds AS (
      SELECT quantile_cont(revenue, 0.25) AS b1,
             quantile_cont(revenue, 0.5)  AS b2,
             quantile_cont(revenue, 0.75) AS b3
      FROM per_cust),
    bucketed AS (
      SELECT CASE WHEN revenue <= b1 THEN 1
                  WHEN revenue <= b2 THEN 2
                  WHEN revenue <= b3 THEN 3
                  ELSE 4 END AS quartile,
             revenue
      FROM per_cust CROSS JOIN bounds)
    SELECT quartile, count(*) AS n_customers,
           round(min(revenue), 2) AS min_revenue,
           round(max(revenue), 2) AS max_revenue
    FROM bucketed GROUP BY quartile ORDER BY quartile
    """
)


# ---------------------------------------------------------------------------
# training-data composition gate: split/sample, mixture, boilerplate removal
# (operators/sampling.py, operators/cleanup.py — the round-4 families,
# promoted from pytest-only coverage into the driver's oracle gate)
# ---------------------------------------------------------------------------

# split weights / stratum fractions are module constants so the Spark plan
# and the generated DuckDB SQL share ONE source of truth — the bucket edges
# are computed with the identical int(round(f * _BUCKETS)) expression on
# both sides, so engine rounding can never drift.
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_LANG_FRACS = {"en": 0.5, "es": 0.3, "de": 0.2, "fr": 1.0, "zh": 0.1}


@query("docs_hash_split_sample")
def docs_hash_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (hash_split) composed with
    a per-language stratified downsample (stratified_sample) — the corpus
    release shape. Both are pure hash-predicate projections: no shuffle
    until the final count, and the assignment of any row is independent
    of partitioning and cluster size (sampling.py's leak-free guarantee).
    Oracle replays both predicates from the same constants."""
    from etl_instagram_spark.operators.sampling import hash_split, stratified_sample

    docs = _t(spark, sf_dir, "documents")
    d = hash_split(docs, "doc_id", dict(_SPLIT_WEIGHTS))
    s = stratified_sample(d, "doc_id", dict(_LANG_FRACS), strata_col="lang")
    base = d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    samp = s.groupBy("split").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        base.join(samp, "split", "left")
        .withColumn("n_sampled", F.coalesce("n_sampled", F.lit(0)))
        .orderBy("split")
    )


def _sql_hash_split_sample() -> str:
    from etl_instagram_spark.operators.sampling import (
        _BUCKETS,
        bucket_sql,
        split_sql_case,
    )

    case = split_sql_case("doc_id", _SPLIT_WEIGHTS, salt="split")
    b = bucket_sql("doc_id", "sample")
    arms = " ".join(
        f"WHEN '{k}' THEN {int(round(f * _BUCKETS))}" for k, f in _LANG_FRACS.items()
    )
    return f"""
    WITH d AS (SELECT *, {case} AS split FROM documents),
    base AS (
      SELECT split, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM d GROUP BY split),
    s AS (
      SELECT split, count(*) AS n_sampled
      FROM d WHERE {b} < (CASE lang {arms} ELSE 0 END)
      GROUP BY split)
    SELECT base.split, n_docs, sum_chars, coalesce(n_sampled, 0) AS n_sampled
    FROM base LEFT JOIN s USING (split)
    ORDER BY base.split
    """


oracle("docs_hash_split_sample", _sql_hash_split_sample)


_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
# weights are chosen binary-exact and summing to exactly 1.0 so the
# Python-side mixture_fractions arithmetic (which divides by total_w)
# and the simplified SQL below (which omits the exact /1.0) compute
# bit-identical doubles — the fraction → bucket-edge rounding then
# matches on both engines by construction.


@query("docs_corpus_mixture")
def docs_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixture (mix_corpora): three sources down-sampled
    to a 50/25/25 token-weighted blend, binding source kept whole. The
    membership itself is value-checked (id_sum), not just the counts —
    the oracle recomputes the per-source keep-fractions from the same
    sizes with the same arithmetic and replays the hash predicate."""
    from etl_instagram_spark.operators.sampling import mix_corpora

    docs = _t(spark, sf_dir, "documents")
    sources = {
        name: docs.filter(F.col("source") == name) for name in _MIX_WEIGHTS
    }
    mixed = mix_corpora(
        sources, dict(_MIX_WEIGHTS), "doc_id", weigh_by="n_chars", salt="mixture"
    )
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("source")
    )


def _sql_corpus_mixture() -> str:
    from etl_instagram_spark.operators.sampling import _BUCKETS, bucket_sql

    names = list(_MIX_WEIGHTS)
    in_list = ", ".join(f"'{s}'" for s in names)
    shares = " UNION ALL ".join(
        f"SELECT '{s}' AS source, CAST({w!r} AS DOUBLE) AS w"
        for s, w in _MIX_WEIGHTS.items()
    )
    bucket_case = (
        "CASE d.source "
        + " ".join(
            f"WHEN '{s}' THEN {bucket_sql('d.doc_id', f'mixture:{s}')}"
            for s in names
        )
        + " END"
    )
    return f"""
    WITH sizes AS (
      SELECT source, CAST(sum(n_chars) AS DOUBLE) AS avail
      FROM documents WHERE source IN ({in_list}) GROUP BY source),
    shares AS ({shares}),
    caps AS (
      SELECT s.source, avail, w, avail / w AS cap
      FROM sizes s JOIN shares USING (source)),
    fr AS (
      SELECT source,
             least(CAST(1.0 AS DOUBLE),
                   ((SELECT min(cap) FROM caps) * w) / avail) AS frac
      FROM caps),
    edges AS (
      -- round_even = banker's rounding, matching the Python side's
      -- int(round(frac * _BUCKETS)) in stratified_sample exactly;
      -- plain round() is half-away-from-zero and would drift on a
      -- data-dependent fraction landing exactly on a .5 edge
      SELECT source,
             CAST(round_even(frac * {_BUCKETS}, 0) AS BIGINT) AS edge FROM fr)
    SELECT d.source, count(*) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(d.doc_id) AS BIGINT) AS id_sum
    FROM documents d JOIN edges e USING (source)
    WHERE ({bucket_case}) < e.edge
    GROUP BY d.source
    ORDER BY d.source
    """


oracle("docs_corpus_mixture", _sql_corpus_mixture)


@query("docs_boilerplate_removal")
def docs_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet cross-document boilerplate removal
    (cleanup.remove_boilerplate_lines) at word granularity: the synthetic
    documents are single-line, so spaces become line breaks and any word
    appearing in >= 100 distinct documents is "boilerplate" — the same
    explode → distinct-doc count → threshold → anti-join → ordered
    reassembly pipeline a crawl corpus needs, value-checked per document
    via distinct-md5 counting. Two line-level shuffles, no UDF."""
    from etl_instagram_spark.operators.cleanup import remove_boilerplate_lines

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.translate("text", " ", "\n").alias("text")
    )
    cleaned = remove_boilerplate_lines(
        docs, "doc_id", "text", min_docs=100, out_col="clean"
    )
    return (
        cleaned.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_boilerplate_removed").alias("n_removed"),
            F.sum(F.length("clean")).alias("sum_clean_chars"),
            F.countDistinct(F.md5("clean")).alias("n_distinct_clean"),
        )
        .orderBy("lang")
    )


oracle(
    "docs_boilerplate_removal",
    """
    WITH nl AS (
      SELECT doc_id, lang, replace(text, ' ', chr(10)) AS t FROM documents),
    split AS (
      SELECT doc_id, lang, string_split(t, chr(10)) AS parts FROM nl),
    posed AS (
      SELECT doc_id, lang, parts,
             unnest(generate_series(1, len(parts))) AS pos
      FROM split),
    lines AS (
      SELECT doc_id, lang, pos, parts[pos] AS line,
             trim(lower(parts[pos])) AS norm
      FROM posed),
    bp AS (
      SELECT norm FROM lines WHERE norm <> ''
      GROUP BY norm HAVING count(DISTINCT doc_id) >= 100),
    flagged AS (
      SELECT doc_id, lang, pos, line,
             (norm <> '' AND norm IN (SELECT norm FROM bp)) AS is_bp
      FROM lines),
    rebuilt AS (
      SELECT doc_id, any_value(lang) AS lang,
             coalesce(
               string_agg(CASE WHEN NOT is_bp THEN line END,
                          chr(10) ORDER BY pos),
               '') AS clean,
             sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS n_removed
      FROM flagged GROUP BY doc_id)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_removed) AS BIGINT) AS n_removed,
           CAST(sum(length(clean)) AS BIGINT) AS sum_clean_chars,
           count(DISTINCT md5(clean)) AS n_distinct_clean
    FROM rebuilt GROUP BY lang ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# documents: per-source frequency cap (C4/RefinedWeb domain capping)
# ---------------------------------------------------------------------------


@query("docs_domain_cap")
def docs_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sampling.cap_per_group: keep at most 15 docs per source
    (uniform deterministic preference — hashed-id rank), then audit the
    survivors per source. The id_sum makes the hash sensitive to WHICH
    rows survived, not just how many — the oracle replays the identical
    rank via ``cap_rank_sql`` (shared ``bucket_sql`` hash)."""
    from etl_instagram_spark.operators.sampling import cap_per_group

    docs = _t(spark, sf_dir, "documents")
    capped = cap_per_group(docs, "source", "doc_id", 15, salt="cap")
    return (
        capped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("chars_kept"),
        )
        .orderBy("source")
    )


def _sql_domain_cap() -> str:
    from etl_instagram_spark.operators.sampling import cap_rank_sql

    rn = cap_rank_sql("doc_id", "source", salt="cap")
    return f"""
    WITH r AS (SELECT source, doc_id, n_chars, {rn} AS rn FROM documents)
    SELECT source, count(*) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM r WHERE rn <= 15 GROUP BY source ORDER BY source
    """


oracle("docs_domain_cap", _sql_domain_cap())


# ---------------------------------------------------------------------------
# documents: Gopher quality-filter rule set
# ---------------------------------------------------------------------------


_GOPHER_RULES = (
    "n_words",
    "word_len",
    "symbol_ratio",
    "alpha_words",
    "stopwords",
    "bullet_lines",
    "ellipsis_lines",
    "dup_lines",
    "dup_line_chars",
)


@query("docs_gopher_filter")
def docs_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/cleanup.gopher_filter at the paper-default thresholds:
    per language, how many docs pass the full Gopher rule set and how
    many fail EACH rule — all nine violation expressions replayed
    verbatim by the oracle, so the rule arithmetic (tokenization, ratio
    guards, line shapes, dup fractions) is value-checked end-to-end, not
    just the pass count. On the synthetic corpus several line-shape
    rules are vacuous (single-line docs) — their zero counts are still
    hash-checked; the crafted-doc rule coverage lives in
    tests/test_cleanup.py."""
    from etl_instagram_spark.operators.cleanup import gopher_filter

    docs = _t(spark, sf_dir, "documents")
    flagged = gopher_filter(docs, "text")
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("gopher_pass").cast("long")).alias("n_pass"),
            *[
                F.sum(F.col(f"fail_{r}").cast("long")).alias(f"fail_{r}")
                for r in _GOPHER_RULES
            ],
        )
        .orderBy("lang")
    )


# DuckDB mirror of every gopher_flags expression (same thresholds as the
# Python defaults; blank-doc and empty-list guards spelled out —
# list_sum([]) is NULL in DuckDB where Spark's aggregate-from-0 gives 0;
# NULL text coalesced to '' exactly like the operator)
_SQL_GOPHER_STOPS = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"
oracle(
    "docs_gopher_filter",
    f"""
    WITH src AS (SELECT lang, coalesce(text, '') AS text FROM documents),
    g AS (
      SELECT lang,
             trim(text) = '' AS blank,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({SQL_TOKS}) END AS nw,
             {SQL_TOKS} AS toks,
             list_filter(list_transform(regexp_split_to_array(text, '\\r?\\n'),
                                        s -> trim(s)), s -> s <> '') AS rl,
             list_filter(list_transform(regexp_split_to_array(lower(text), '\\r?\\n'),
                                        s -> trim(s)), s -> s <> '') AS nlns,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell
      FROM src),
    m AS (
      SELECT lang, blank, nw,
             CASE WHEN nw > 0
                  THEN coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
                       / CAST(nw AS DOUBLE)
                  ELSE 0.0 END AS mean_wl,
             CASE WHEN nw > 0 THEN (n_hash + n_ell) / CAST(nw AS DOUBLE)
                  ELSE 0.0 END AS symbol_ratio,
             CASE WHEN nw > 0
                  THEN len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                       / CAST(nw AS DOUBLE)
                  ELSE 0.0 END AS alpha_frac,
             CASE WHEN blank THEN 0
                  ELSE len(list_filter(toks,
                           t -> list_contains({_SQL_GOPHER_STOPS}, t))) END AS stop_hits,
             CASE WHEN len(rl) > 0
                  THEN len(list_filter(rl, s -> starts_with(s, '- ')
                                            OR starts_with(s, '* ')
                                            OR starts_with(s, '•')))
                       / CAST(len(rl) AS DOUBLE)
                  ELSE 0.0 END AS bullet_frac,
             CASE WHEN len(rl) > 0
                  THEN len(list_filter(rl, s -> ends_with(s, '...')
                                            OR ends_with(s, '…')))
                       / CAST(len(rl) AS DOUBLE)
                  ELSE 0.0 END AS ellipsis_frac,
             CASE WHEN len(nlns) > 1
                  THEN (len(nlns) - len(list_distinct(nlns)))
                       / CAST(len(nlns) AS DOUBLE)
                  ELSE 0.0 END AS dup_frac,
             CASE WHEN coalesce(list_sum(list_transform(nlns, s -> length(s))), 0) > 0
                  THEN (list_sum(list_transform(nlns, s -> length(s)))
                        - list_sum(list_transform(list_distinct(nlns), s -> length(s))))
                       / CAST(list_sum(list_transform(nlns, s -> length(s))) AS DOUBLE)
                  ELSE 0.0 END AS dup_char_frac
      FROM g),
    f AS (
      SELECT lang,
             (nw < 50 OR nw > 100000) AS f_n_words,
             (NOT blank) AND (mean_wl < 3.0 OR mean_wl > 10.0) AS f_word_len,
             symbol_ratio > 0.1 AS f_symbol_ratio,
             (NOT blank) AND alpha_frac < 0.8 AS f_alpha_words,
             stop_hits < 2 AS f_stopwords,
             bullet_frac > 0.9 AS f_bullet_lines,
             ellipsis_frac > 0.3 AS f_ellipsis_lines,
             dup_frac > 0.3 AS f_dup_lines,
             dup_char_frac > 0.2 AS f_dup_line_chars
      FROM m)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN NOT (f_n_words OR f_word_len OR f_symbol_ratio
                                   OR f_alpha_words OR f_stopwords
                                   OR f_bullet_lines OR f_ellipsis_lines
                                   OR f_dup_lines OR f_dup_line_chars)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN f_n_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_n_words,
           CAST(sum(CASE WHEN f_word_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_len,
           CAST(sum(CASE WHEN f_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol_ratio,
           CAST(sum(CASE WHEN f_alpha_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_words,
           CAST(sum(CASE WHEN f_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords,
           CAST(sum(CASE WHEN f_bullet_lines THEN 1 ELSE 0 END) AS BIGINT) AS fail_bullet_lines,
           CAST(sum(CASE WHEN f_ellipsis_lines THEN 1 ELSE 0 END) AS BIGINT) AS fail_ellipsis_lines,
           CAST(sum(CASE WHEN f_dup_lines THEN 1 ELSE 0 END) AS BIGINT) AS fail_dup_lines,
           CAST(sum(CASE WHEN f_dup_line_chars THEN 1 ELSE 0 END) AS BIGINT) AS fail_dup_line_chars
    FROM f GROUP BY lang ORDER BY lang
    """,
)


# ---------------------------------------------------------------------------
# sequence packing gate: cumsum + first-fit-decreasing (operators/packing.py)
# ---------------------------------------------------------------------------

_PACK_SHARDS = 8
_PACK_BUDGET_CUMSUM = 1000
_PACK_BUDGET_FFD = 500  # < max n_chars (553) so oversize singletons occur


def _sql_pack_shard(id_expr: str) -> str:
    """DuckDB mirror of packing._shard (hash32 of the stringified id)."""
    from etl_instagram_spark.functions.text import hash32_sql

    return f"CAST({hash32_sql(f'({id_expr})::VARCHAR')} % {_PACK_SHARDS} AS INT)"


@query("docs_pack_cumsum")
def docs_pack_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF-free sequence packing (packing.pack_cumsum): hash-shard fan-
    out, per-shard (tokens desc, id) running sum, bin = cumsum // budget.
    Value-checked per shard: bin count, doc count, token conservation,
    max bin load, and mean fill — the oracle replays the identical window
    arithmetic, so the bin ASSIGNMENT (not just totals) is certified.
    avg_fill is derived from the INTEGER aggregates (floor of an exactly
    representable ratio), never from averaged rounded doubles, so the
    value is partitioning/summation-order independent on both engines."""
    from etl_instagram_spark.operators.packing import bin_fill_stats, pack_cumsum

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_cumsum(
        docs, "doc_id", "n_chars", budget=_PACK_BUDGET_CUMSUM, shards=_PACK_SHARDS
    )
    bins = bin_fill_stats(packed, "n_chars", _PACK_BUDGET_CUMSUM)
    return (
        bins.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("bin_tokens").alias("sum_tokens"),
            F.max("bin_tokens").alias("max_bin_tokens"),
        )
        .withColumn(
            "avg_fill",
            F.floor(
                F.lit(10000.0)
                * F.col("sum_tokens")
                / (F.col("n_bins") * F.lit(_PACK_BUDGET_CUMSUM))
            )
            / F.lit(10000.0),
        )
        .orderBy("shard")
    )


def _sql_pack_cumsum() -> str:
    b = _PACK_BUDGET_CUMSUM
    return f"""
    WITH base AS (
      SELECT doc_id, n_chars AS t, {_sql_pack_shard("doc_id")} AS shard
      FROM documents),
    binned AS (
      SELECT shard, t,
             CAST(floor(coalesce(sum(t) OVER (
               PARTITION BY shard ORDER BY t DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {b}.0)
             AS BIGINT) AS bin_idx
      FROM base),
    bins AS (
      SELECT shard, bin_idx, count(*) AS n_docs,
             CAST(sum(t) AS BIGINT) AS bin_tokens
      FROM binned GROUP BY shard, bin_idx),
    agg AS (
      SELECT shard, count(*) AS n_bins,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(sum(bin_tokens) AS BIGINT) AS sum_tokens,
             max(bin_tokens) AS max_bin_tokens
      FROM bins GROUP BY shard)
    SELECT shard, n_bins, n_docs, sum_tokens, max_bin_tokens,
           floor(10000.0 * sum_tokens / (n_bins * {b})) / 10000.0 AS avg_fill
    FROM agg ORDER BY shard
    """


oracle("docs_pack_cumsum", _sql_pack_cumsum)


@query("docs_pack_first_fit")
def docs_pack_first_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict budget packing (packing.pack_first_fit, applyInPandas FFD
    per shard). The oracle SIMULATES first-fit-decreasing exactly with a
    recursive CTE carrying the open-bin capacity list per shard — so bin
    count, oversize-singleton count, and total slack are value-certified
    against an independent FFD implementation, not just conservation
    invariants. Budget 500 < max(n_chars) so the oversize path runs."""
    from etl_instagram_spark.operators.packing import pack_first_fit

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_first_fit(
        docs, "doc_id", "n_chars", budget=_PACK_BUDGET_FFD, shards=_PACK_SHARDS
    )
    per_bin = packed.groupBy("shard", "bin_idx").agg(
        F.max("oversize").alias("oversize"),
        F.count(F.lit(1)).alias("bin_docs"),
        F.sum("n_chars").alias("bin_tokens"),
    )
    return (
        per_bin.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("bin_docs").alias("n_docs"),
            F.sum(F.when(F.col("oversize"), 1).otherwise(0))
            .cast("long")
            .alias("n_oversize"),
            F.sum(
                F.when(
                    ~F.col("oversize"),
                    F.lit(_PACK_BUDGET_FFD) - F.col("bin_tokens"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("slack"),
        )
        .orderBy("shard")
    )


def _sql_pack_first_fit() -> str:
    b = _PACK_BUDGET_FFD
    # caps list semantics mirror packing._pack: remaining capacity per
    # open bin, -1 for a CLOSED oversize singleton; first fitting bin
    # found via list_position over a cap >= t bitmap (0 = no fit)
    fit = "list_position(list_transform(f.caps, c -> c >= d.t), true)"
    return f"""
    WITH RECURSIVE base AS (
      SELECT doc_id, n_chars AS t, {_sql_pack_shard("doc_id")} AS shard
      FROM documents),
    ordered AS (
      SELECT shard, doc_id, t,
             row_number() OVER (PARTITION BY shard ORDER BY t DESC, doc_id) AS rn
      FROM base),
    ffd AS (
      SELECT shard, 0::BIGINT AS rn, CAST([] AS BIGINT[]) AS caps
      FROM (SELECT DISTINCT shard FROM ordered)
      UNION ALL
      SELECT f.shard, d.rn,
        CASE
          WHEN d.t > {b} THEN list_append(f.caps, (-1)::BIGINT)
          WHEN {fit} = 0 THEN list_append(f.caps, ({b} - d.t)::BIGINT)
          ELSE f.caps[1:{fit}-1] || [f.caps[{fit}] - d.t] || f.caps[{fit}+1:]
        END
      FROM ffd f JOIN ordered d ON d.shard = f.shard AND d.rn = f.rn + 1),
    final AS (
      SELECT shard, caps FROM ffd f
      WHERE rn = (SELECT max(rn) FROM ffd f2 WHERE f2.shard = f.shard))
    SELECT f.shard,
           CAST(len(f.caps) AS BIGINT) AS n_bins,
           (SELECT count(*) FROM ordered o WHERE o.shard = f.shard) AS n_docs,
           CAST(len(list_filter(f.caps, c -> c = -1)) AS BIGINT) AS n_oversize,
           CAST(coalesce(list_sum(list_filter(f.caps, c -> c >= 0)), 0)
                AS BIGINT) AS slack
    FROM final f ORDER BY f.shard
    """


oracle("docs_pack_first_fit", _sql_pack_first_fit)


# ---------------------------------------------------------------------------
# PII redaction gate (operators/cleanup.redact_pii / pii_counts)
# ---------------------------------------------------------------------------


@query("docs_pii_audit")
def docs_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit over a deterministic contact-blurb injection:
    every doc_id % 3 == 0 gains a synthetic email, every doc_id % 4 == 0
    a synthetic IPv4 (the corpus documents themselves contain no PII, so
    the gate manufactures it identically on both engines). Runs the REAL
    operators — cleanup.pii_counts for the per-kind audit and
    cleanup.redact_pii for the rewrite — and value-checks match counts,
    docs-touched, and total redacted-span length per source.

    Gate covers the email+ipv4 patterns only: the phone pattern uses
    lookarounds, which DuckDB's RE2 cannot run — phone redaction keeps
    pytest-only coverage (tests/test_cleanup.py)."""
    from etl_instagram_spark.operators.cleanup import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    email = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.lit(" from "),
            ((F.col("doc_id") % 223) + 1).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 13) % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") % 254) + 1).cast("string"),
        ),
    ).otherwise(F.lit(""))
    txt = F.concat(F.col("text"), email, ip)
    staged = docs.select(
        "source",
        pii_counts(txt).alias("pii"),
        (F.length(txt) - F.length(redact_pii(txt, kinds=("email", "ipv4")))).alias(
            "delta"
        ),
    )
    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pii.email").cast("long").alias("n_emails"),
            F.sum("pii.ipv4").cast("long").alias("n_ips"),
            F.sum(F.when(F.col("delta") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_redacted"),
            F.sum("delta").cast("long").alias("sum_char_delta"),
        )
        .orderBy("source")
    )


def _sql_pii_audit() -> str:
    from etl_instagram_spark.operators.cleanup import _PII_PATTERNS

    pats = {k: p for k, p, _ in _PII_PATTERNS}
    em = pats["email"].replace("'", "''")
    ip = pats["ipv4"].replace("'", "''")
    return f"""
    WITH staged AS (
      SELECT source,
             text
             || (CASE WHEN doc_id % 3 = 0
                 THEN ' reach user' || doc_id::VARCHAR || '@mail'
                      || (doc_id % 7)::VARCHAR || '.example.com'
                 ELSE '' END)
             || (CASE WHEN doc_id % 4 = 0
                 THEN ' from ' || ((doc_id % 223) + 1)::VARCHAR || '.'
                      || ((doc_id * 7) % 256)::VARCHAR || '.'
                      || ((doc_id * 13) % 256)::VARCHAR || '.'
                      || ((doc_id % 254) + 1)::VARCHAR
                 ELSE '' END) AS txt
      FROM documents),
    counted AS (
      SELECT source, txt,
             len(regexp_extract_all(txt, '{em}')) AS n_email,
             len(regexp_extract_all(regexp_replace(txt, '{em}', '<EMAIL>', 'g'),
                                    '{ip}')) AS n_ip,
             length(txt) - length(
               regexp_replace(regexp_replace(txt, '{em}', '<EMAIL>', 'g'),
                              '{ip}', '<IP>', 'g')) AS delta
      FROM staged)
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS n_emails,
           CAST(sum(n_ip) AS BIGINT) AS n_ips,
           CAST(sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_redacted,
           CAST(sum(delta) AS BIGINT) AS sum_char_delta
    FROM counted GROUP BY source ORDER BY source
    """


oracle("docs_pii_audit", _sql_pii_audit)


# ---------------------------------------------------------------------------
# benchmark decontamination gate (operators/cleanup.flag_contaminated)
# ---------------------------------------------------------------------------

_DECON_N = 13


@query("docs_decontamination")
def docs_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """13-gram benchmark decontamination (cleanup.flag_contaminated): the
    eval set is every doc_id % 17 == 3 document — even ids truncated to
    their first 5 tokens so the short-item path (corpus re-shingled at
    the eval item's own length m < n) runs through the gate; odd ids are
    kept whole for the standard 13-gram path but only when they have
    >= 13 tokens. The length gate bounds the operator's documented
    per-distinct-short-length cost to ONE extra corpus projection
    (short_ms == {5}) — an unbounded eval set of sub-13-token items is
    exactly the shape flag_contaminated's docstring says to keep
    separate. Value-checked per source: contaminated-doc count and total
    distinct hit shingles."""
    from etl_instagram_spark.operators.cleanup import flag_contaminated

    docs = _spread(spark, _t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    n_toks = F.size(T.tokens(F.col("text")))
    bench = (
        docs.filter(F.col("doc_id") % 17 == 3)
        .filter((F.col("doc_id") % 2 == 0) | (n_toks >= _DECON_N))
        .select(
            F.when(
                F.col("doc_id") % 2 == 0,
                F.array_join(F.slice(T.tokens(F.col("text")), 1, 5), " "),
            )
            .otherwise(F.col("text"))
            .alias("text")
        )
    )
    flagged = flag_contaminated(docs, bench, "doc_id", "text", n=_DECON_N)
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("contaminated"), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
            F.sum("n_hit_shingles").cast("long").alias("sum_hits"),
        )
        .orderBy("source")
    )


def _sql_decontamination() -> str:
    n = _DECON_N
    # short_ms is DYNAMIC (any bench item under n tokens adds its own
    # length), mirroring flag_contaminated's bounded driver collect —
    # in SQL it's just a distinct-lengths CTE cross-joined into the
    # corpus shingling, no hardcoded m
    return f"""
    WITH toks AS (
      SELECT doc_id, source, {SQL_TOKS} AS toks FROM documents),
    bench AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN toks[1:5] ELSE toks END AS btoks
      FROM toks
      WHERE doc_id % 17 = 3
        AND (doc_id % 2 = 0 OR len(toks) >= {n})),
    short_ms AS (
      SELECT DISTINCT len(btoks) AS m FROM bench
      WHERE len(btoks) > 0 AND len(btoks) < {n}),
    bench_pos AS (
      SELECT btoks, unnest(generate_series(1, len(btoks) - {n} + 1)) AS i
      FROM bench WHERE len(btoks) >= {n}),
    bench_keys AS (
      SELECT DISTINCT md5(sh) AS k FROM (
        SELECT array_to_string(btoks[i:i+{n}-1], ' ') AS sh FROM bench_pos
        UNION ALL
        SELECT array_to_string(btoks, ' ') AS sh
        FROM bench WHERE len(btoks) > 0 AND len(btoks) < {n})),
    doc_pos_n AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - {n} + 1)) AS i
      FROM toks),
    doc_pos_m AS (
      SELECT doc_id, toks, m,
             unnest(generate_series(1, len(toks) - m + 1)) AS i
      FROM toks CROSS JOIN short_ms),
    doc_keys AS (
      SELECT DISTINCT doc_id, md5(sh) AS k FROM (
        SELECT doc_id, array_to_string(toks[i:i+{n}-1], ' ') AS sh FROM doc_pos_n
        UNION ALL
        SELECT doc_id, array_to_string(toks[i:i+m-1], ' ') AS sh FROM doc_pos_m)),
    hits AS (
      SELECT doc_id, count(*) AS n_hits
      FROM doc_keys JOIN bench_keys USING (k) GROUP BY doc_id)
    SELECT t.source, count(*) AS n_docs,
           CAST(sum(CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(sum(coalesce(h.n_hits, 0)) AS BIGINT) AS sum_hits
    FROM toks t LEFT JOIN hits h USING (doc_id)
    GROUP BY t.source ORDER BY t.source
    """


oracle("docs_decontamination", _sql_decontamination)


# ---------------------------------------------------------------------------
# documents: exact heavy hitters (bounded-memory frequent terms)
# ---------------------------------------------------------------------------

# support = 1/100 as an exact rational; the threshold predicate is pure
# integer arithmetic (count*den >= n*num) on BOTH engines, so there is no
# float/ceil surface to drift
_HH_NUM, _HH_DEN = 1, 100


@query("docs_heavy_hitters")
def docs_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/frequency.heavy_hitters over the corpus token stream:
    terms at ≥1 % of all tokens, with EXACT counts, computed without
    ever group-by-shuffling the full term domain (two-pass Misra-Gries:
    bounded per-partition candidate summaries, then an exact verify of
    the broadcast candidate set only). The oracle is the plain
    GROUP BY ... HAVING the operator provably equals."""
    from etl_instagram_spark.operators.frequency import heavy_hitters

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    terms = docs.select(F.explode(T.tokens(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    return heavy_hitters(terms, "term", _HH_NUM, _HH_DEN).orderBy(
        F.desc("n_occ"), "term"
    )


oracle(
    "docs_heavy_hitters",
    f"""
    WITH toks AS (SELECT unnest({SQL_TOKS}) AS term FROM documents),
         t AS (SELECT term FROM toks WHERE term IS NOT NULL AND term <> ''),
         tot AS (SELECT count(*) AS n FROM t)
    SELECT term, count(*) AS n_occ
    FROM t CROSS JOIN tot
    GROUP BY term, tot.n
    HAVING count(*) * {_HH_DEN} >= tot.n * {_HH_NUM}
    ORDER BY n_occ DESC, term
    """,
)


# ---------------------------------------------------------------------------
# documents: exact all-pairs n-gram Jaccard join (prefix-filtered)
# ---------------------------------------------------------------------------


# (docs_ngram_jaccard rotated out of the gate in r14 to make room for
# events_dcm_quantiles — the near-dup family stays gated via
# docs_near_dedup_summary and emb_near_dedup, which cover the banding,
# signature, and survivor kernels; the prefix-filtered exact-Jaccard
# join stays cross-engine-checked every round through
# plans/parity_extras.py)
def docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.jaccard_join at τ=0.5: every document pair with
    exact 3-gram Jaccard ≥ 0.5, with the similarity value. The Spark side
    runs the prefix-filtered inverted-index join (frequency-ordered
    prefixes, size filter, candidate-only verify); the oracle runs the
    NAIVE all-pairs join — the gate therefore certifies that prefix
    filtering is lossless on real data, not just in the unit tests."""
    from etl_instagram_spark.operators.dedup import jaccard_join

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    pairs = jaccard_join(docs, "doc_id", "text", threshold=0.5)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("id_a", "id_b")


SQL_DOCS_NGRAM_JACCARD = f"""
    WITH t AS (SELECT doc_id, trim(lower(text)) AS norm, {SQL_TOKS} AS toks
               FROM documents),
         s AS (SELECT doc_id,
                      CASE WHEN len(toks) < 3 THEN [norm]
                           ELSE [array_to_string(toks[i:i+2], ' ')
                                 for i in range(1, len(toks) - 1)] END AS sh
               FROM t),
         d AS (SELECT doc_id, list_distinct(sh) AS dsh FROM s),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                          len(list_intersect(a.dsh, b.dsh))::DOUBLE
                            / len(list_distinct(a.dsh || b.dsh)) AS j
                   FROM d a JOIN d b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, round(j, 4) AS jaccard
    FROM pairs WHERE j >= 0.5
    ORDER BY id_a, id_b
    """


# ---------------------------------------------------------------------------
# documents: chunking (fixed token windows with stride overlap)
# ---------------------------------------------------------------------------

_CHUNK_TOKENS, _CHUNK_STRIDE = 64, 48


@query("docs_chunking")
def docs_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/packing.chunk_documents over the corpus: 64-token
    windows with 16-token overlap (stride 48). Chunk text is md5'd so
    the gate compares full content without hashing megabytes of strings;
    token counts and chunk indices ride along. The oracle replays the
    windows with DuckDB list slicing from the same tokenizer mirror."""
    from etl_instagram_spark.operators.packing import chunk_documents

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    out = chunk_documents(
        docs.select("doc_id", "text"),
        "doc_id",
        "text",
        chunk_tokens=_CHUNK_TOKENS,
        stride=_CHUNK_STRIDE,
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
        "n_chunk_tokens",
    ).orderBy("doc_id", "chunk_idx")


oracle(
    "docs_chunking",
    f"""
    WITH t AS (SELECT doc_id,
                      -- case-PRESERVING split (not SQL_TOKS, which
                      -- lowercases for the analysis kernels); empty
                      -- fragments filtered so tab/newline-edged, blank,
                      -- and NULL text all behave like the Spark side
                      list_filter(
                        regexp_split_to_array(coalesce(text, ''), '[{SQL_WS}]+'),
                        x -> x <> '') AS toks
               FROM documents),
         c AS (SELECT doc_id, toks,
                      1 + CAST(ceil(greatest(len(toks) - {_CHUNK_TOKENS}, 0)::DOUBLE
                                    / {_CHUNK_STRIDE}) AS INT) AS nc
               FROM t)
    SELECT doc_id, i AS chunk_idx,
           md5(coalesce(array_to_string(
                 toks[1 + i*{_CHUNK_STRIDE} : i*{_CHUNK_STRIDE} + {_CHUNK_TOKENS}],
                 ' '), '')) AS chunk_md5,
           coalesce(len(toks[1 + i*{_CHUNK_STRIDE} : i*{_CHUNK_STRIDE} + {_CHUNK_TOKENS}]), 0)
             AS n_chunk_tokens
    FROM c CROSS JOIN unnest(range(nc)) u(i)
    ORDER BY doc_id, chunk_idx
    """,
)


# ---------------------------------------------------------------------------
# embeddings: kNN self-join recall (all-rows ANN vs brute force)
# ---------------------------------------------------------------------------

# subset cap keeps the exact side O(cap²) at every SF — the gate measures
# recall semantics, not brute-force throughput
_KNN_JOIN_CAP = 200


@query("emb_knn_join_recall")
def emb_knn_join_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of operators/similarity.knn_self_join (top-k neighbors
    for EVERY row via multi-probe bucket equi-join) against the
    brute-force self-join, at probe radii Hamming ≤ {1, 2}, over the
    vec_id < 200 subcorpus. Totals are integer hit counts (no float
    accumulation ordering), recall derived from one division of the
    totals; wider probing must never score lower. The oracle replays
    both sides — buckets from the same hyperplane constants, Hamming
    probe, rounded-cosine windows — entirely in SQL."""
    from etl_instagram_spark.operators.similarity import (
        knn_self_join,
        knn_self_join_exact,
    )

    emb = (
        _spread(spark, _t(spark, sf_dir, "embeddings"))
        .filter(F.col("vec_id") < _KNN_JOIN_CAP)
        .withColumn("bucket", _bucket_col())
    )
    gt = knn_self_join_exact(emb.select("vec_id", "embedding"), k=10).select(
        "vec_id", "neighbor_id"
    )
    radii = spark.range(1, 3).select(F.col("id").cast("int").alias("probe_hamming"))
    gt = gt.crossJoin(F.broadcast(radii))
    ann = None
    for r in (1, 2):
        part = knn_self_join(
            emb,
            k=10,
            bits=HYPERPLANE_BITS,
            multi_probe_hamming=r,
            bucket_col="bucket",
        ).select(
            "vec_id",
            "neighbor_id",
            F.lit(r).alias("probe_hamming"),
            F.lit(1).alias("hit"),
        )
        ann = part if ann is None else ann.unionByName(part)
    return (
        gt.join(ann, ["vec_id", "neighbor_id", "probe_hamming"], "left")
        .groupBy("probe_hamming")
        .agg(
            F.count(F.lit(1)).alias("n_truth_pairs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("total_hits"),
        )
        .select(
            "probe_hamming",
            "n_truth_pairs",
            "total_hits",
            F.round(F.col("total_hits") / F.col("n_truth_pairs"), 4).alias(
                "recall_at_10"
            ),
        )
        .orderBy("probe_hamming")
    )


oracle(
    "emb_knn_join_recall",
    f"""
    WITH b AS (SELECT vec_id, embedding, {_sql_bucket()} AS bucket
               FROM embeddings WHERE vec_id < {_KNN_JOIN_CAP}),
         radii AS (SELECT unnest([1, 2]) AS probe_hamming),
         pairs AS (
           SELECT a.vec_id, bb.vec_id AS neighbor_id,
                  round(list_dot_product(a.embedding::DOUBLE[], bb.embedding::DOUBLE[])
                        / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                           * sqrt(list_dot_product(bb.embedding::DOUBLE[], bb.embedding::DOUBLE[]))),
                        6) AS cos_sim,
                  bit_count(xor(a.bucket, bb.bucket)) AS ham
           FROM b a JOIN b bb ON a.vec_id <> bb.vec_id),
         gt AS (SELECT vec_id, probe_hamming, neighbor_id FROM
                  (SELECT vec_id, neighbor_id,
                          row_number() OVER (PARTITION BY vec_id
                                             ORDER BY cos_sim DESC, neighbor_id) AS r
                   FROM pairs) CROSS JOIN radii WHERE r <= 10),
         ann AS (SELECT vec_id, probe_hamming, neighbor_id, 1 AS hit FROM
                  (SELECT vec_id, probe_hamming, neighbor_id,
                          row_number() OVER (PARTITION BY vec_id, probe_hamming
                                             ORDER BY cos_sim DESC, neighbor_id) AS r
                   FROM pairs CROSS JOIN radii WHERE ham <= probe_hamming)
                 WHERE r <= 10)
    SELECT probe_hamming,
           count(*) AS n_truth_pairs,
           CAST(sum(coalesce(hit, 0)) AS BIGINT) AS total_hits,
           round(CAST(sum(coalesce(hit, 0)) AS BIGINT)
                 / count(*)::DOUBLE, 4) AS recall_at_10
    FROM gt LEFT JOIN ann USING (vec_id, probe_hamming, neighbor_id)
    GROUP BY probe_hamming ORDER BY probe_hamming
    """,
)


# ---------------------------------------------------------------------------
# distributed k-means (operators/clustering.py) — promoted to the gate in r8
# (order_gap_days rotated to plans/parity_extras.py)
# ---------------------------------------------------------------------------

_KMEANS_K, _KMEANS_ITERS = 8, 2


@query("emb_kmeans_cells")
def emb_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means end to end (operators/clustering.py): seeded
    sample init → 2 full-data Lloyd's iterations → per-cell (n, sse)
    cost profile. Every stage is a deterministic function of the data
    (sorted init sample; per-element 6dp rounding + exact DECIMAL sums;
    driver-side float(sum)/n division), so the DuckDB oracle replays
    init AND both refinement iterations with its own engine doing all
    the data math and lands on bit-identical centroids, assignments,
    and cost — the gate's first certified ITERATIVE algorithm (the
    other fit-from-data oracles replay one fit, not a convergence
    loop). Scale: each iteration is one scan whose map-side partial
    aggregation collapses every partition to ≤ k rows of (count,
    per-dim decimal sums) before the shuffle."""
    from etl_instagram_spark.operators.clustering import (
        kmeans_cost,
        refine_centroids,
    )
    from etl_instagram_spark.operators.similarity import fit_ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    init = fit_ivf_centroids(
        emb, n_clusters=_KMEANS_K, seed=42, order_col="vec_id"
    )
    cents = refine_centroids(emb, init, n_iter=_KMEANS_ITERS)
    return kmeans_cost(emb, cents)


def _kmeans_oracle_sql() -> str:
    """DuckDB mirror of emb_kmeans_cells, built lazily (the centroids
    are FIT from the gate data). Init reads the same ORDER BY vec_id
    LIMIT 4096 sample through DuckDB and runs the identical seeded
    ``lloyd_kmeans``; each refinement iteration computes per-cell counts
    and exact long micro-unit element sums IN DuckDB — the same
    ``floor(x·10^QUANT_DP)::BIGINT`` quantization (floor stays pure codegen on the Spark side — round(double) allocates a BigDecimal per value) the Spark side
    aggregates, with assignment via the shared ``shifted_score_sql``
    text so both engines rank bit-identical doubles — and applies the
    same Python ``(sum/scale)/n`` update the Spark driver does; the
    returned SQL profiles the final centroids' cells with the identical
    micro-unit SSE sum the Spark side publishes."""
    import os

    import duckdb
    import numpy as np

    from etl_instagram_spark.operators.clustering import QUANT_DP
    from etl_instagram_spark.operators.similarity import lloyd_kmeans

    scale = 10**QUANT_DP
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    con = duckdb.connect()
    sample = con.sql(
        f"SELECT embedding::DOUBLE[] FROM '{path}' "
        "WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 4096"
    ).fetchall()
    cur = lloyd_kmeans(
        np.asarray([r[0] for r in sample], dtype=np.float64),
        _KMEANS_K,
        seed=42,
    )
    cur = [[float(x) for x in c] for c in cur]
    dim = len(cur[0])
    sums = ", ".join(
        f"sum(CAST(floor(CAST(embedding[{d + 1}] AS DOUBLE) * {scale}.0)"
        f" AS BIGINT)) AS s{d}"
        for d in range(dim)
    )
    for _ in range(_KMEANS_ITERS):
        dists = _sql_centroid_dists(cur)
        rows = con.sql(
            f"SELECT (list_position(d, list_min(d)) - 1) AS cell,"
            f"       count(*) AS n, {sums} "
            f"FROM (SELECT {dists} AS d, embedding FROM '{path}' "
            f"      WHERE embedding IS NOT NULL) t "
            f"GROUP BY cell"
        ).fetchall()
        for r in rows:
            cell, n = int(r[0]), int(r[1])
            if n:
                cur[cell] = [(int(r[2 + d]) / scale) / n for d in range(dim)]
    con.close()
    dists = _sql_centroid_dists(cur)
    sumsq = " + ".join(
        f"CAST(embedding[{d + 1}] AS DOUBLE) * CAST(embedding[{d + 1}] AS DOUBLE)"
        for d in range(dim)
    )
    return f"""
    SELECT cell, count(*) AS n,
           round(CAST(sum(CAST(floor(sse_row * {scale}.0) AS BIGINT))
                      AS DOUBLE) / {scale}.0, 4) AS sse
    FROM (SELECT (list_position(d, list_min(d)) - 1) AS cell,
                 (list_min(d) + ({sumsq})) AS sse_row
          FROM (SELECT {dists} AS d, embedding
                FROM '{path}' WHERE embedding IS NOT NULL) t) u
    GROUP BY cell ORDER BY cell
    """


oracle("emb_kmeans_cells", _kmeans_oracle_sql)


# ---------------------------------------------------------------------------
# graph centrality (operators/graph.py) — promoted to the gate in r10
# (nation_customer_listagg rotated to plans/parity_extras.py)
# ---------------------------------------------------------------------------


@query("graph_pagerank_suppliers")
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank (operators/graph.py) over the
    customer↔supplier interaction graph: top-20 suppliers by stationary
    mass after 3 power iterations. Ranks are integer micro-units and
    every update is pure int64 arithmetic, so the result is
    partition-order-independent and the oracle — a fixed-iteration CTE
    chain doing the SAME integer math — replays every round INSIDE
    DuckDB and lands on bit-identical BIGINTs. Second certified
    iterative algorithm after emb_kmeans_cells, and the first whose
    oracle is one standalone SQL statement (no Python-side replay
    loop). Scale: the edge list shuffles once at setup (pinned layout);
    each iteration moves only the node-sized rank frame and the
    groupBy(dst) sum collapses map-side to ≤ |nodes| rows/partition."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        pagerank,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ranks = pagerank(bipartite_order_edges(od, li), n_iter=3)
    return (
        ranks.filter(F.col("id") % 2 == 1)
        .select(F.expr("(id - 1) div 2").alias("s_suppkey"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "s_suppkey")
        .limit(20)
    )


def _pagerank_oracle_sql() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_SQL,
        pagerank_oracle_sql,
    )

    return f"""
    WITH {pagerank_oracle_sql(BIPARTITE_ORDER_EDGES_SQL, n_iter=3)}
    SELECT (id - 1) // 2 AS s_suppkey, rank_micro
    FROM r3 WHERE id % 2 = 1
    ORDER BY rank_micro DESC, s_suppkey
    LIMIT 20
    """


oracle("graph_pagerank_suppliers", _pagerank_oracle_sql())


# ---------------------------------------------------------------------------
# near-dup clusters as the product (operators/dedup.duplicate_clusters) —
# promoted to the gate in r10 (top3_orders_per_customer rotated)
# ---------------------------------------------------------------------------

# the oracle replays min-label propagation for a FIXED round count; the
# Spark side iterates to convergence, so equality needs rounds ≥ the
# dup graph's min-label convergence depth. Dup clusters are hub-shaped
# (diameter 2-4); 16 is a 4-8× margin, and extra rounds are no-ops
# (min-label is monotone — the fixed point absorbs)
_CC_ORACLE_ROUNDS = 16


@query("docs_dup_cluster_reps")
def docs_dup_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS as the deliverable: MinHash-LSH
    candidates → exact-Jaccard verify → connected components
    (operators/dedup.duplicate_clusters) → one canonical representative
    per cluster (longest text, ties to the smallest doc_id — the
    "keep best" curation policy, vs the survivor rule's "keep
    smallest id"). The oracle replays the ENTIRE pipeline in one SQL
    statement, including connected components as _CC_ORACLE_ROUNDS (16)
    monotone min-label rounds — certifying the CC operator cross-engine
    for the first time (previously differential-tested against
    union-find only). Scale: components run O(diameter) key-equi
    rounds over the O(duplicates) verified-pair list, never the corpus;
    the reps window partitions by component (bounded groups)."""
    from pyspark.sql import Window

    from etl_instagram_spark.operators.dedup import duplicate_clusters

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    cl = duplicate_clusters(
        docs, "doc_id", "text", threshold=0.5, k=MINHASH_K, bands=MINHASH_BANDS
    )
    sized = cl.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    reps = (
        sized.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").alias("rep_chars"),
        )
    )
    agg = sized.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.sum("n_chars").alias("total_chars"),
    )
    return (
        agg.join(reps, "component")
        .select(
            "component",
            "cluster_size",
            "rep_doc_id",
            "rep_chars",
            "total_chars",
        )
        .orderBy(F.col("cluster_size").desc(), "component")
    )


def _sql_cc_rounds(rounds: int) -> str:
    """Fixed-round min-label propagation CTEs over ``verified`` pairs:
    ``edges`` (symmetric), ``l0`` (label = own id), ``l{i}`` = per-node
    min over self + neighbors' round-(i-1) labels. After convergence
    every label is the component minimum; extra rounds are no-ops.
    The final CTE is ``lcc``: round-``rounds`` labels gated by a LOUD
    convergence assertion — labels are monotone non-increasing, so
    sum(component) equal across the last two rounds ⇔ converged; if a
    deeper-than-budget chain ever appears in the data, DuckDB raises
    ``error('cc oracle: ...')`` instead of silently certifying
    non-minimal labels. Consumers must read ``lcc``, not ``l{rounds}``.

    Every round CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    each round references its predecessor twice — inlining would expand
    the chain to 2^rounds copies of the base scan (the first run of
    this oracle died opening ~65k file handles). Materialization makes
    the replay linear in rounds, which is also what the Spark side's
    per-round localCheckpoint does."""
    parts = [
        "edges AS MATERIALIZED (SELECT ia AS u, ib AS v FROM verified"
        " UNION SELECT ib, ia FROM verified)",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS component FROM edges)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT id, min(component) AS component FROM ("
            f" SELECT id, component FROM l{i - 1}"
            f" UNION ALL"
            f" SELECT e.v AS id, l.component FROM edges e"
            f" JOIN l{i - 1} l ON e.u = l.id) x GROUP BY id)"
        )
    parts.append(
        f"lcc AS MATERIALIZED (SELECT id, CASE WHEN"
        f" COALESCE((SELECT sum(component) FROM l{rounds}), 0)"
        f" = COALESCE((SELECT sum(component) FROM l{rounds - 1}), 0)"
        f" THEN component ELSE error('cc oracle: label propagation not"
        f" converged within {rounds} rounds — raise the budget')"
        f" END AS component FROM l{rounds})"
    )
    return ",\n".join(parts)


oracle(
    "docs_dup_cluster_reps",
    f"""
    WITH {_sql_verified_pairs()},
    {_sql_cc_rounds(_CC_ORACLE_ROUNDS)},
    sized AS (SELECT l.id AS doc_id, l.component, d.n_chars
              FROM lcc l
              JOIN documents d ON d.doc_id = l.id),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY component
                          ORDER BY n_chars DESC, doc_id) AS rn
               FROM sized),
    agg AS (SELECT component, count(*) AS cluster_size,
                   (sum(n_chars))::BIGINT AS total_chars
            FROM sized GROUP BY component)
    SELECT a.component, a.cluster_size,
           r.doc_id AS rep_doc_id, r.n_chars AS rep_chars, a.total_chars
    FROM agg a JOIN ranked r ON r.component = a.component AND r.rn = 1
    ORDER BY a.cluster_size DESC, a.component
    """,
)


@query("part_entity_resolution")
def part_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over part names (operators/entity.py) — block
    on the name's last token, verify with levenshtein ≤ 3, cluster with
    connected components, emit the per-entity merge audit. Promoted
    from EXTRAS to the gate in r11 so the driver certifies the ER
    family directly; the oracle replays blocking, the edit-distance
    verify (levenshtein is a built-in with identical integer semantics
    in both engines), AND the convergence-asserted CC rounds in one
    DuckDB statement."""
    from etl_instagram_spark.operators.entity import canonical_entities

    pa = _t(spark, sf_dir, "part")
    # composite (last token, brand) block: the block key IS the scale
    # lever (candidate_pairs docstring) — last-token alone leaves ~2k-row
    # blocks at sf0.1 (~2·10^8 levenshtein pairs); the brand facet cuts
    # pair volume ~25× while still exercising cross-block non-matches
    # concat, not concat_ws: a NULL brand must propagate to a NULL
    # block (row leaves resolution) exactly like the oracle's ``||``
    # (the sampling._bucket convention)
    block = F.concat(
        F.element_at(F.split(F.trim(F.lower(F.col("p_name"))), " "), -1),
        F.lit("\x1f"),
        F.col("p_brand"),
    )
    return canonical_entities(pa, "p_partkey", "p_name", block, max_dist=3)


def _sql_part_entity_resolution() -> str:
    return f"""
    WITH n AS (SELECT p_partkey AS id, trim(lower(p_name)) AS norm,
                      p_brand FROM part),
    b AS (SELECT id, norm,
                 string_split(norm, ' ')[-1] || chr(31) || p_brand AS blk
          FROM n WHERE norm IS NOT NULL AND p_brand IS NOT NULL),
    verified AS (SELECT a.id AS ia, b2.id AS ib
                 FROM b a JOIN b b2
                   ON a.blk = b2.blk AND a.id < b2.id
                 WHERE levenshtein(a.norm, b2.norm) <= 3),
    {_sql_cc_rounds(16)},
    named AS (SELECT l.id, l.component AS entity, n.norm
              FROM lcc l JOIN n ON n.id = l.id),
    agg AS (SELECT entity, count(*) AS n_members,
                   count(DISTINCT norm) AS n_name_variants
            FROM named GROUP BY entity)
    SELECT a.entity, a.n_members, a.n_name_variants,
           c.norm AS canonical_name
    FROM agg a JOIN n c ON c.id = a.entity
    ORDER BY a.n_members DESC, a.entity
    """


oracle("part_entity_resolution", _sql_part_entity_resolution())



# ---------------------------------------------------------------------------
# leakage-safe corpus splitting — promoted to the gate in r10
# (part_metrics_unpivot rotated to plans/parity_extras.py)
# ---------------------------------------------------------------------------

_LEAK_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}


@query("docs_leakage_safe_split")
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment keyed on CONTENT, not id: the split
    bucket hashes the normalized text, so byte-identical duplicates
    land in the same split by construction and can never leak
    train→test (the standard eval-contamination failure when splitting
    a deduplicated-later corpus by doc id). Pure scan-stage
    projections — both the group key and the split are per-row hash
    expressions, no shuffle until the audit aggregation.

    The result is the audit: per split, doc and distinct-group counts
    plus the redundant-duplicate count, and two global columns —
    ``leaked_groups`` (dup groups straddling splits under the
    content-keyed assignment: provably 0, COMPUTED not asserted) vs
    ``leaked_groups_docid_split`` (the same count under the naive
    id-keyed split — the leak this operator exists to prevent)."""
    from etl_instagram_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents").withColumn(
        "gk", T.hash32(F.trim(F.lower(F.col("text"))))
    )
    d = hash_split(docs, "gk", dict(_LEAK_WEIGHTS), salt="leakfree")
    d = hash_split(
        d, "doc_id", dict(_LEAK_WEIGHTS), salt="leakfree", split_col="split_docid"
    )
    per = d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("gk").alias("n_groups"),
    )
    leaked = (
        d.groupBy("gk")
        .agg(
            F.countDistinct("split").alias("ns"),
            F.countDistinct("split_docid").alias("nsd"),
        )
        .agg(
            F.count(F.when(F.col("ns") > 1, True)).alias("leaked_groups"),
            F.count(F.when(F.col("nsd") > 1, True)).alias(
                "leaked_groups_docid_split"
            ),
        )
    )
    return (
        per.crossJoin(F.broadcast(leaked))  # one-row audit side
        .select(
            "split",
            "n_docs",
            "n_groups",
            (F.col("n_docs") - F.col("n_groups")).alias("dup_docs"),
            "leaked_groups",
            "leaked_groups_docid_split",
        )
        .orderBy("split")
    )


def _sql_leakage_safe_split() -> str:
    from etl_instagram_spark.functions.text import hash32_sql
    from etl_instagram_spark.operators.sampling import split_sql_case

    gk = hash32_sql("trim(lower(text))")
    case_gk = split_sql_case(gk, _LEAK_WEIGHTS, salt="leakfree")
    case_id = split_sql_case("doc_id", _LEAK_WEIGHTS, salt="leakfree")
    return f"""
    WITH d AS (SELECT {gk} AS gk, {case_gk} AS split, {case_id} AS split_docid
               FROM documents),
    per AS (SELECT split, count(*) AS n_docs,
                   count(DISTINCT gk) AS n_groups
            FROM d GROUP BY split),
    leaked AS (SELECT count(*) FILTER (ns > 1) AS leaked_groups,
                      count(*) FILTER (nsd > 1) AS leaked_groups_docid_split
               FROM (SELECT gk, count(DISTINCT split) AS ns,
                            count(DISTINCT split_docid) AS nsd
                     FROM d GROUP BY gk))
    SELECT split, n_docs, n_groups, n_docs - n_groups AS dup_docs,
           leaked_groups, leaked_groups_docid_split
    FROM per CROSS JOIN leaked
    ORDER BY split
    """


oracle("docs_leakage_safe_split", _sql_leakage_safe_split())


# ---------------------------------------------------------------------------
# r13 gate promotions: the driver now certifies the sketch and behavioral
# families directly (seats from docs_simhash and emb_ann_recall, both of
# which keep full parity in plans/parity_extras.py)
# ---------------------------------------------------------------------------


@query("events_cm_frequency")
def events_cm_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated r13 (EXTRAS since r11): count-min point-frequency sketch
    (operators/sketches.cm_sketch/cm_lookup) — per-event-type user
    frequencies at a deliberately narrow width (w=256 forces real
    collisions), probed for every (type, user) pair with the exact
    count as contrast; registers, hashes, and min-estimates all replay
    bit-for-bit in DuckDB. The overcount guarantee (est ≥ exact) is
    certified on every row by construction of the compared columns."""
    from etl_instagram_spark.operators.sketches import cm_lookup, cm_sketch

    ev = _t(spark, sf_dir, "events")
    w, d = 256, 4
    sk = cm_sketch(ev, "user_id", ["event_type"], w=w, d=d)
    qs = ev.select("event_type", "user_id").distinct()
    est = cm_lookup(sk, qs, "user_id", ["event_type"], w=w, d=d)
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return (
        est.join(exact, ["event_type", "user_id"])
        .withColumn(
            "overcount", (F.col("cm_estimate") - F.col("exact_count")).cast("long")
        )
        .orderBy(F.col("overcount").desc(), "event_type", "user_id")
        .limit(50)
    )


def _sql_events_cm_frequency() -> str:
    from etl_instagram_spark.operators.sketches import (
        cm_lookup_sql,
        cm_sketch_sql,
    )

    w, d = 256, 4
    sk = cm_sketch_sql("user_id", "events", ["event_type"], w=w, d=d)
    lookup = cm_lookup_sql(
        sk,
        "SELECT DISTINCT event_type, user_id AS value FROM events",
        "value",
        ["event_type"],
        w=w,
        d=d,
    )
    return f"""
    WITH est AS ({lookup}),
    exact AS (SELECT event_type, user_id, count(*)::BIGINT AS exact_count
              FROM events GROUP BY event_type, user_id)
    SELECT e.event_type, e.user_id, est.cm_estimate, e.exact_count,
           (est.cm_estimate - e.exact_count)::BIGINT AS overcount
    FROM est JOIN exact e
      ON est.event_type = e.event_type AND est.value = e.user_id
    ORDER BY overcount DESC, e.event_type, e.user_id
    LIMIT 50
    """


oracle("events_cm_frequency", _sql_events_cm_frequency())


FUNNEL_WINDOW_S = 7 * 24 * 3600


@query("events_funnel_levels")
def events_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated r13 (EXTRAS since r10): earliest-anchor view→click→purchase
    funnel within 7 days (operators/funnel.py) — per-level
    reached/stopped counts and mean seconds-to-depth, all replayed in
    SQL. Semantics pinned precisely because engines disagree
    (ClickHouse windowFunnel makes the same earliest-anchor trade)."""
    from etl_instagram_spark.operators.funnel import funnel_summary

    ev = _t(spark, sf_dir, "events")
    return funnel_summary(
        ev,
        "user_id",
        "ts",
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        within_seconds=FUNNEL_WINDOW_S,
    )


SQL_FUNNEL_LEVELS = f"""
    WITH base AS (SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                         event_type FROM events),
    l1 AS (SELECT u, min(t) AS t1 FROM base WHERE event_type = 'view' GROUP BY u),
    l2 AS (SELECT b.u, l1.t1, min(b.t) AS t2
           FROM base b JOIN l1 ON b.u = l1.u
           WHERE b.event_type = 'click' AND b.t > l1.t1
             AND b.t <= l1.t1 + {FUNNEL_WINDOW_S}
           GROUP BY b.u, l1.t1),
    l3 AS (SELECT b.u, l2.t1, min(b.t) AS t3
           FROM base b JOIN l2 ON b.u = l2.u
           WHERE b.event_type = 'purchase' AND b.t > l2.t2
             AND b.t <= l2.t1 + {FUNNEL_WINDOW_S}
           GROUP BY b.u, l2.t1),
    stopped AS (
      SELECT 1 AS level, l1.t1, l1.t1 AS t_last FROM l1
      LEFT JOIN l2 ON l1.u = l2.u WHERE l2.u IS NULL
      UNION ALL
      SELECT 2, l2.t1, l2.t2 FROM l2
      LEFT JOIN l3 ON l2.u = l3.u WHERE l3.u IS NULL
      UNION ALL
      SELECT 3, t1, t3 FROM l3),
    by_level AS (
      SELECT level, count(*) AS n_stopped,
             round(CAST(sum(t_last - t1) AS DOUBLE) / count(*), 4)
               AS avg_secs_to_here
      FROM stopped GROUP BY level)
    SELECT level,
           (sum(n_stopped) OVER (ORDER BY level DESC))::BIGINT AS n_reached,
           n_stopped, avg_secs_to_here
    FROM by_level ORDER BY level
    """


oracle("events_funnel_levels", SQL_FUNNEL_LEVELS)


# ---------------------------------------------------------------------------
# r14 gate promotion: the driver now certifies the QUANTILE face of the
# sketch family directly (seat from docs_ngram_jaccard, which keeps full
# parity in plans/parity_extras.py)
# ---------------------------------------------------------------------------


@query("events_dcm_quantiles")
def events_dcm_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated r14 (EXTRAS since r13): dyadic count-min QUANTILE sketch
    (operators/sketches.dcm_sketch/dcm_quantiles, the r12 addition) —
    per-event-type value quantiles (p25/p50/p75/p95) answered from the
    ≤ d·w·b-row register state alone via the b-round integer bit
    descent; registers AND every descent round replay bit-for-bit in
    DuckDB (dcm_quantiles_sql CTE chain). ``exact_below`` contrasts
    each answer with the true strictly-below count — certifying the
    quantile against the DATA, not just the twin engine.

    Values are cents: ``floor(value*100)`` — floor-then-cast because
    DuckDB's double→BIGINT cast ROUNDS while Spark's truncates; floor
    is an exactly-rounded IEEE op so both engines see the same
    integer. Domain [1, 49003) fits the default b=16 bits.

    Scale: the sketch is one explode+counting groupBy (shuffle ≤
    groups·d·w·b rows regardless of input); the descent probes a
    groups×quantiles frame b times against the pinned tiny register
    frame; the contrast join broadcasts the 20-row quantile frame over
    one events scan. Reference analogue: the rates time-series
    percentile surface (eldolar.js:17-36 → SURVEY §2.9)."""
    from etl_instagram_spark.operators.sketches import (
        dcm_quantiles,
        dcm_sketch,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"),
    )
    sk = dcm_sketch(ev, "v", ["event_type"])
    qs = dcm_quantiles(
        sk, [(1, 4), (1, 2), (3, 4), (19, 20)], ["event_type"]
    ).localCheckpoint(eager=True)  # reused: output + contrast probe
    exact = (
        F.broadcast(qs.select("event_type", "q_num", "q_den", "q_value"))
        .join(ev, "event_type")
        .filter(F.col("v") < F.col("q_value"))
        .groupBy("event_type", "q_num", "q_den")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_below"))
    )
    return (
        qs.join(exact, ["event_type", "q_num", "q_den"], "left")
        .withColumn(
            "exact_below",
            F.coalesce("exact_below", F.lit(0)).cast("long"),
        )
        .select(
            "event_type",
            "q_num",
            "q_den",
            "n",
            "target",
            "q_value",
            "exact_below",
        )
        .orderBy("event_type", "q_den", "q_num")
    )


def _sql_events_dcm_quantiles() -> str:
    from etl_instagram_spark.operators.sketches import (
        dcm_quantiles_sql,
        dcm_sketch_sql,
    )

    sk = dcm_sketch_sql("CAST(floor(value * 100) AS BIGINT)", "events", ["event_type"])
    ctes = dcm_quantiles_sql(sk, [(1, 4), (1, 2), (3, 4), (19, 20)], ["event_type"])
    return f"""
    WITH {ctes},
    ev AS (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
    exact AS (SELECT q.event_type, q.q_num, q.q_den,
                     (count(*) FILTER (WHERE e.v < q.q_value))::BIGINT AS exact_below
              FROM qout q JOIN ev e ON e.event_type = q.event_type
              GROUP BY q.event_type, q.q_num, q.q_den)
    SELECT q.event_type, q.q_num, q.q_den, q.n, q.target, q.q_value,
           COALESCE(x.exact_below, 0)::BIGINT AS exact_below
    FROM qout q LEFT JOIN exact x
      ON x.event_type = q.event_type AND x.q_num = q.q_num
     AND x.q_den = q.q_den
    ORDER BY q.event_type, q.q_den, q.q_num
    """


oracle("events_dcm_quantiles", _sql_events_dcm_quantiles())
