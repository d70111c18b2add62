"""Rotated-out gate queries, kept under pytest DuckDB parity.

The driver's CORRECTNESS file caps at 50 rows, so promoting new operator
families into the gate forces rotation. Rotation must not silently drop
operator-surface coverage: every query rotated OUT of the 50-row gate
moves HERE as a (spark_fn, oracle_sql) pair, and
tests/test_rotated_parity.py runs each pair against DuckDB with the same
value-and-type comparison the driver applies — the gate shrinks, the
regression surface does not.

Current entries:
- ``pivot_returnflag_status`` (r6 rotation; conditional-agg pivot —
  CUBE stays gated via cube_returnflag_status)
- ``top10_customers_by_revenue`` (r6; join+agg+global top-k — the same
  TakeOrderedAndProject shape stays gated via q3_unshipped_revenue)
- ``orders_date_functions`` (r6; date-part extraction — date arithmetic
  stays gated via order_gap_days / customer_rolling_30d_revenue)
- ``docs_top_terms_per_doc`` (r6; per-doc top-terms kernel — the same
  stemmer/stopword/top-k path stays gated via docs_top_terms_by_lang)
- ``segment_rollup`` / ``customer_running_revenue`` (re-created: the r5
  rotation dropped the gate's only ROLLUP/grouping-sets and cumulative
  window-frame coverage with no replacement — these restore both
  surfaces at pytest level)
- ``customers_without_urgent_orders`` (r6; NOT-EXISTS anti-join — the
  semi-join sibling stays gated via q4_order_priority_semijoin)
- ``docs_minhash_bands`` (r6; banding audit — signature/band machinery
  stays gated end-to-end via docs_near_dedup_summary)
- ``events_sessionization`` (r6; lag-gap batch sessionization — the
  NATIVE session_window stays gated via events_session_window_native)
- ``emb_ann_lsh_topk`` (r6; single-query bucket top-k — the bucket path
  stays gated via emb_ann_recall and emb_knn_join_recall)
- ``emb_knn_cosine`` (r6, for emb_semantic_dedup; exact-cosine stays
  gated via the recall queries' ground-truth sides)
- ``supplier_geo_bands`` (r6, for docs_domain_cap; haversine keeps
  pytest coverage in functions/geo.py)
- ``q6_forecast_revenue`` (r6, for docs_gopher_filter; filter+global-agg
  stays gated via q1_pricing_summary / conditional_agg_promo_share)
- ``part_url_parse`` (r6, for docs_bm25_topk; the parse_url surface
  keeps projection pytest coverage)
- ``conditional_agg_promo_share`` (r6, for emb_pq_recall;
  CASE-WHEN-in-aggregate stays gated via docs_gopher_filter /
  cube_returnflag_status)
- ``docs_quality_bands`` (r6, for docs_bpe_tokens; quality scoring
  stays gated via docs_gopher_filter's nine-rule profile)
- ``docs_unigram_ppl`` (never gated — the CCNet perplexity signal,
  value-checked against a model-literal SQL mirror like the gate's
  fit-from-data oracles)

Never-gated entries (EXTRAS has no row cap, so surfaces that would
displace gate diversity get driver-grade value+type parity here):
``docs_hybrid_rrf`` (BM25 ⊕ cosine fusion), ``docs_unigram_ppl`` /
``docs_bigram_ppl`` (LM perplexity, uni + stupid-backoff bigram),
``docs_bpe_pack`` (tokenizer-fit → learned-token counts → budget
packing, end to end), ``orders_profile`` (one-scan column profiler),
``orders_above_customer_avg`` (correlated scalar subquery),
``customer_rank_distributions`` (percent_rank / cume_dist),
``events_gapfill`` (LOCF + linear time-bucket gap filling),
``events_anomalies`` (rolling z-score profile).

r8 rotation: ``order_gap_days`` (LAG offset window) moved here to gate
the distributed-k-means query ``emb_kmeans_cells`` (plans/llm_queries.py
— sample init + full-data Lloyd's refinement + per-cell cost, init and
every iteration replayed through DuckDB).

r10 rotations: ``top3_orders_per_customer`` (row_number top-k; shape
stays gated via docs_bm25_topk),
``nation_customer_listagg`` (listagg), ``part_metrics_unpivot``
(unpivot/Expand) — seats given to the integer-quantized PageRank
(``graph_pagerank_suppliers``), near-dup cluster representatives
(``docs_dup_cluster_reps``, the first cross-engine-certified
connected-components row), and the content-keyed leakage-safe split
(``docs_leakage_safe_split``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from etl_instagram_spark.plans.queries import _t

EXTRAS: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str]] = {}


def _extra(name: str, sql: str):
    def deco(fn):
        EXTRAS[name] = (fn, sql)
        return fn

    return deco


@_extra(
    "pivot_returnflag_status",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns per returnflag (SURVEY §2.6 —
    conditional aggregation; Catalyst rewrites pivot to CASE WHEN aggs)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
        .orderBy("l_returnflag")
    )


@_extra(
    "top10_customers_by_revenue",
    """
    SELECT c_custkey, c_name,
           round(sum(o_totalprice), 2) AS revenue,
           count(*)                    AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def top10_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + global top-k (reference O2 orderBy+limit generalized;
    engages TakeOrderedAndProject instead of a full sort)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@_extra(
    "orders_date_functions",
    """
    SELECT o_orderkey,
           year(o_orderdate)                       AS order_year,
           month(o_orderdate)                      AS order_month,
           dayofmonth(o_orderdate)                 AS order_day,
           quarter(o_orderdate)                    AS order_quarter,
           strftime(o_orderdate, '%Y-%m')          AS order_ym,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoh
    FROM orders WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def orders_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time kernel (F13 analogue): extract parts, truncation, diff."""
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_eoh"),
    ).orderBy("o_orderkey")


def _sql_top_terms_per_doc() -> str:
    from etl_instagram_spark.plans.llm_queries import _sql_stop_drop_predicate

    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(
               list_transform(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r,"]+'),
                              x -> regexp_replace(lower(x), '[^a-z''A-Z0-9À-ÿ ]+', '', 'g')),
               t -> {_sql_stop_drop_predicate()}) AS terms
      FROM documents WHERE doc_id < 50),
    flat AS (SELECT doc_id, len(terms) AS total, unnest(terms) AS term FROM toks),
    counts AS (SELECT doc_id, total, term, count(*) AS cnt
               FROM flat GROUP BY doc_id, total, term),
    ranked AS (SELECT doc_id, term, cnt, total,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY cnt DESC, term) AS rank
               FROM counts)
    SELECT doc_id, rank,
           round(cnt * 100.0 / total, 2) AS confidence,
           term AS name
    FROM ranked
    WHERE rank <= 7 AND round(cnt * 100.0 / total, 2) >= 2.0
    ORDER BY doc_id, rank
    """


def docs_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-row top_terms kernel (enrich/topics.top_terms_col — the
    reference's getTopics output shape) validated against the oracle:
    attach topics to the first 50 docs, then posexplode to
    (doc_id, rank, confidence, name) rows that plain SQL can reproduce
    with a window over per-term counts."""
    from etl_instagram_spark.enrich.topics import attach_topics

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    topical = attach_topics(docs, text_col=F.col("text"), stem=False, langs=("en",))
    return (
        topical.select("doc_id", F.posexplode("topics").alias("pos", "t"))
        .select(
            "doc_id",
            (F.col("pos") + 1).alias("rank"),
            F.col("t.confidence").alias("confidence"),
            F.col("t.name").alias("name"),
        )
        .orderBy("doc_id", "rank")
    )


EXTRAS["docs_top_terms_per_doc"] = (docs_top_terms_per_doc, _sql_top_terms_per_doc())


@_extra(
    "segment_rollup",
    """
    SELECT c_mktsegment, c_nationkey,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS sum_acctbal
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST
    """,
)
def segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (segment, nation): hierarchical grouping sets in one
    Expand pass — the grouping-sets surface the r5 gate rotation dropped."""
    cu = _t(spark, sf_dir, "customer")
    return (
        cu.rollup("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("c_nationkey").asc_nulls_first(),
        )
    )


@_extra(
    "customer_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_revenue
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window frame (running revenue per customer) — the
    running-sum frame surface the r5 gate rotation dropped; remaining
    gated window queries cover rank/lag/range frames but not this."""
    od = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_revenue"),
    ).orderBy("o_custkey", "o_orderkey")


@_extra(
    "customers_without_urgent_orders",
    """
    SELECT c_mktsegment,
           count(*)               AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4)
             AS avg_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (the engine's incremental-ingest gate,
    J3/J5, operators.merge.anti_join_new) aggregated by segment (r6
    rotation; the semi-join sibling stays gated via
    q4_order_priority_semijoin)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cu.join(od.select("o_custkey").distinct(), cu.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            # c_acctbal is a 2dp grid column: exact DECIMAL sum so the
            # 4dp rounding can't sit on a summation-order tie
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def docs_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding audit: per band, distinct buckets and candidate
    pairs (Σ n·(n−1)/2 over buckets) — the tuning surface for the verify
    join's cost model (r6 rotation; the same signature/band machinery
    stays gated end-to-end via docs_near_dedup_summary)."""
    from etl_instagram_spark.operators.dedup import _band_hashes
    from etl_instagram_spark.plans.llm_queries import (
        MINHASH_BANDS,
        MINHASH_K,
        _spread,
    )
    from etl_instagram_spark.functions import text as T

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    staged = T.with_minhash_signature(docs, "text", "sig", k=MINHASH_K)
    bands = _band_hashes(F.col("sig"), MINHASH_K, MINHASH_BANDS)
    exploded = staged.select(F.posexplode(bands).alias("band_idx", "band_hash"))
    buckets = exploded.groupBy("band_idx", "band_hash").agg(F.count("*").alias("n"))
    return (
        buckets.groupBy("band_idx")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("n_candidate_pairs"),
        )
        .orderBy("band_idx")
    )


from etl_instagram_spark.plans.llm_queries import _sql_minhash_bands  # noqa: E402

EXTRAS["docs_minhash_bands"] = (docs_minhash_bands, _sql_minhash_bands())


@_extra(
    "events_sessionization",
    """
    WITH flagged AS (
      SELECT user_id, value, ts, event_id,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_seq,
             count(*)             AS n_events,
             round(sum(value), 2) AS session_value
      FROM sessions GROUP BY user_id, session_seq
    )
    SELECT user_id,
           count(*)                    AS n_sessions,
           max(n_events)               AS max_session_events,
           round(sum(session_value), 2) AS total_value
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative sum
    of session-start flags — the batch analogue of session_window (r6
    rotation; the NATIVE session_window formulation stays gated via
    events_session_window_native)."""
    from etl_instagram_spark.plans.queries import _epoch_s

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            _epoch_s(F.col("ts")) - F.lag(_epoch_s(F.col("ts"))).over(w) > 1800, 1
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.sum("session_value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


def _sql_ann_lsh_topk_extra() -> str:
    from etl_instagram_spark.plans.llm_queries import _sql_ann_lsh_topk

    return _sql_ann_lsh_topk()


def emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: top-5 cosine neighbors of vec_id=0 among vectors in
    its LSH bucket (r6 rotation; the bucket-filtered path stays gated
    via emb_ann_recall and emb_knn_join_recall)."""
    from etl_instagram_spark.plans.llm_queries import (
        _as_double,
        _bucket_col,
        _dot,
        _spread,
        _t,
    )

    emb = _spread(spark, _t(spark, sf_dir, "embeddings")).withColumn(
        "bucket", _bucket_col()
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("qv"), F.col("bucket").alias("qbucket")
    )
    v = _as_double(F.col("embedding"))
    cos = _dot(v, F.col("qv")) / (
        F.sqrt(_dot(v, v)) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != 0))
        .select("vec_id", "label", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(5)
    )


EXTRAS["emb_ann_lsh_topk"] = (emb_ann_lsh_topk, _sql_ann_lsh_topk_extra())


def _llm(name: str):
    from etl_instagram_spark.plans import llm_queries

    return getattr(llm_queries, name)


def _emb_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force single-query cosine top-10 (r6 rotation for
    emb_semantic_dedup; the exact-cosine surface stays gated via the
    ground-truth sides of emb_ann_recall / emb_knn_join_recall)."""
    return _llm("emb_knn_cosine")(spark, sf_dir)


def _supplier_geo_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haversine distance bands (r6 rotation for docs_domain_cap; the
    trig formula keeps its pytest coverage in functions/geo.py)."""
    return _llm("supplier_geo_bands")(spark, sf_dir)


def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 filter + global agg (r6 rotation for docs_gopher_filter;
    the surface stays gated via q1 / conditional_agg_promo_share)."""
    from etl_instagram_spark.plans.queries import q6_forecast_revenue

    return q6_forecast_revenue(spark, sf_dir)


def _part_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url host/path/query extraction (r6 rotation for
    docs_bm25_topk; the F10 surface keeps projection pytest coverage)."""
    return _llm("part_url_parse")(spark, sf_dir)


def _docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, value-checked end-to-end: reciprocal-rank
    fusion of the BM25 top-10 (docs_bm25_topk's list) with the exact
    cosine top-10 for vec_id=0 (emb_knn_cosine's list, doc_id = vec_id
    as in docs_emb_crossmodal). Never gate-registered — EXTRAS has no
    row cap, and this pins rrf_fuse's rank+fusion arithmetic against a
    full DuckDB replay."""
    from etl_instagram_spark.operators.retrieval import bm25_topk, rrf_fuse
    from etl_instagram_spark.plans import llm_queries

    docs = _t(spark, sf_dir, "documents")
    lex = bm25_topk(docs, "doc_id", "text", llm_queries._BM25_TERMS, k=10)
    vec = llm_queries.emb_knn_cosine(spark, sf_dir).withColumnRenamed(
        "vec_id", "doc_id"
    )
    return rrf_fuse(
        [lex, vec],
        "doc_id",
        [
            [F.col("score").desc(), F.col("doc_id")],
            [F.col("cos_sim").desc(), F.col("doc_id")],
        ],
        k=10,
    )


def _sql_hybrid_rrf() -> str:
    from etl_instagram_spark.plans import llm_queries

    return f"""
    WITH lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r0
      FROM ({llm_queries._sql_bm25_topk()})),
    vec AS (
      SELECT vec_id AS doc_id, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS r1
      FROM ({llm_queries.SQL_KNN_COSINE})),
    f AS (
      SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
             CAST(r0 AS DOUBLE) AS rank_0,
             CAST(r1 AS DOUBLE) AS rank_1,
             round(0.0 + CASE WHEN r0 IS NOT NULL THEN 1.0 / (60.0 + r0) ELSE 0.0 END
                       + CASE WHEN r1 IS NOT NULL THEN 1.0 / (60.0 + r1) ELSE 0.0 END,
                   6) AS rrf_score
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
    SELECT doc_id, rank_0, rank_1, rrf_score
    FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10
    """


def _docs_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r14): the MANY-QUERIES inverted-index BM25 face
    (operators/retrieval.build_bm25_index + bm25_topk_indexed) — the
    amortized complement of the gate's scan-path docs_bm25_topk. Same
    terms, same k, and by the fixed-order score fold the EXACT same
    rows and 6-dp scores, so the oracle IS the scan path's SQL replay:
    one cross-engine statement certifies both faces agree with each
    other and with DuckDB. Scale: query cost is O(postings of the
    query terms) — with term-partitioned storage, partition pruning —
    never a corpus scan (pushdown pinned by test)."""
    from etl_instagram_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
    )
    from etl_instagram_spark.plans import llm_queries

    docs = _t(spark, sf_dir, "documents")
    postings, corpus = build_bm25_index(docs, "doc_id", "text")
    return bm25_topk_indexed(
        postings, corpus, "doc_id", llm_queries._BM25_TERMS, k=10
    )


def _sql_docs_bm25_indexed() -> str:
    from etl_instagram_spark.plans import llm_queries

    return llm_queries._sql_bm25_topk()


def _conditional_agg_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 conditional aggregate (r6 rotation for emb_pq_recall;
    CASE-WHEN-in-aggregate stays gated via docs_gopher_filter /
    cube_returnflag_status)."""
    from etl_instagram_spark.plans.queries import conditional_agg_promo_share

    return conditional_agg_promo_share(spark, sf_dir)


def _docs_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality-score bands (r6 rotation for docs_bpe_tokens;
    quality scoring stays gated via docs_gopher_filter's nine rules)."""
    return _llm("docs_quality_bands")(spark, sf_dir)


def _docs_unigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal, value-checked end-to-end: fit the
    add-one unigram model on the corpus (one distributed counting pass),
    score every document's bits-per-word relationally (broadcast model
    join — no UDF), roll up per source. Never gate-registered — EXTRAS
    has no row cap; the SQL mirror re-fits the model from DuckDB's
    counts through the same pure math and inlines identical doubles."""
    from etl_instagram_spark.operators.lm import doc_bits_per_word, fit_unigram_lm

    docs = _t(spark, sf_dir, "documents")
    lm = fit_unigram_lm(docs)
    scored = doc_bits_per_word(docs, lm)
    return (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.round(F.avg("bits_per_word"), 4).alias("avg_bits_per_word"),
        )
        .orderBy("source")
    )


def _sql_unigram_ppl() -> str:
    import os

    import duckdb

    from etl_instagram_spark.operators.lm import (
        unigram_lm_from_freqs,
        unigram_model_sql_values,
    )
    from etl_instagram_spark.operators.tokenizer import WORD_SPLIT_REGEX

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "documents.parquet")
    split = f"string_split_regex(lower(text), '{WORD_SPLIT_REGEX}')"
    con = duckdb.connect()
    freqs = con.sql(
        f"""
        SELECT w AS word, count(*) AS freq
        FROM (SELECT unnest({split}) AS w FROM '{path}' WHERE text IS NOT NULL)
        WHERE w <> ''
        GROUP BY w ORDER BY freq DESC, word ASC LIMIT 65536
        """
    ).fetchall()
    con.close()
    lm = unigram_lm_from_freqs([(w, int(f)) for w, f in freqs])
    return f"""
    WITH m(word, logp) AS (VALUES {unigram_model_sql_values(lm)}),
    dw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest({split}) AS w
        FROM documents WHERE text IS NOT NULL)
      WHERE w <> ''),
    scored AS (
      SELECT dw.doc_id, count(*) AS n_words,
             avg(-coalesce(m.logp, {lm.oov_logp!r})) AS bpw
      FROM dw LEFT JOIN m ON dw.w = m.word GROUP BY dw.doc_id),
    per_doc AS (
      SELECT d.doc_id, d.source, coalesce(s.n_words, 0) AS n_words, s.bpw
      FROM documents d LEFT JOIN scored s USING (doc_id))
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           round(avg(bpw), 4) AS avg_bits_per_word
    FROM per_doc GROUP BY source ORDER BY source
    """


_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan column profile of orders (exact distincts for the
    parity check; production defaults to HLL). Never gate-registered."""
    from etl_instagram_spark.operators.profiling import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        [c for c, _ in _PROFILE_COLS],
        exact_distinct=True,
    ).orderBy("column")


def _sql_orders_profile() -> str:
    parts = []
    for c, numeric in _PROFILE_COLS:
        mins = (
            f"round(CAST(min({c}) AS DOUBLE), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        )
        maxs = (
            f"round(CAST(max({c}) AS DOUBLE), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        )
        avgs = (
            f"round(avg(CAST({c} AS DOUBLE)), 4)" if numeric else "CAST(NULL AS DOUBLE)"
        )
        parts.append(
            f"""SELECT '{c}' AS "column", count(*) AS n_rows,
                count(*) - count({c}) AS n_nulls,
                count(DISTINCT {c}) AS n_distinct,
                {mins} AS min_d, {maxs} AS max_d, {avgs} AS avg_d
                FROM orders"""
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


def _docs_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff bigram perplexity per source (the fuller CCNet
    signal): doc-initial words score by unigram, later words by their
    observed bigram relative frequency or the 0.4-discounted unigram
    backoff. Spark shapes it as posexplode → window lag → two broadcast
    joins; the mirror re-derives pairs by list-zipping — different
    plans, same math, same literals. Never gate-registered."""
    from etl_instagram_spark.operators.lm import (
        doc_bits_per_word_bigram,
        fit_bigram_lm,
    )

    docs = _t(spark, sf_dir, "documents")
    blm = fit_bigram_lm(docs)
    scored = doc_bits_per_word_bigram(docs, blm)
    return (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.round(F.avg("bits_per_word"), 4).alias("avg_bits_per_word"),
        )
        .orderBy("source")
    )


def _sql_bigram_ppl() -> str:
    import os

    import duckdb

    from etl_instagram_spark.operators.lm import (
        bigram_model_sql_values,
        unigram_model_sql_values,
    )
    from etl_instagram_spark.operators.tokenizer import WORD_SPLIT_REGEX

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "documents.parquet")
    split = f"string_split_regex(lower(text), '{WORD_SPLIT_REGEX}')"
    # refit BOTH tables from DuckDB counts through the same pure model
    # math the Spark side used (fit_bigram_lm's driver step, re-applied)
    import math as _math

    from etl_instagram_spark.operators.lm import BACKOFF, BigramLM, unigram_lm_from_freqs

    con = duckdb.connect()
    uni_freqs = [
        (w, int(f))
        for w, f in con.sql(
            f"""SELECT w, count(*) FROM (SELECT unnest({split}) AS w
                FROM '{path}' WHERE text IS NOT NULL) WHERE w <> ''
                GROUP BY w ORDER BY count(*) DESC, w ASC LIMIT 65536"""
        ).fetchall()
    ]
    bi_rows = con.sql(
        f"""WITH lsts AS (
              SELECT list_filter({split}, w -> w <> '') AS lst
              FROM '{path}' WHERE text IS NOT NULL)
            SELECT p[1] AS prev, p[2] AS word, count(*) AS freq
            FROM (SELECT unnest(list_zip(lst[1:len(lst)-1], lst[2:len(lst)])) AS p
                  FROM lsts WHERE len(lst) >= 2)
            GROUP BY prev, word
            ORDER BY freq DESC, prev ASC, word ASC LIMIT 262144"""
    ).fetchall()
    con.close()
    uni = unigram_lm_from_freqs(uni_freqs)
    ctx = dict(uni_freqs)
    blm = BigramLM(
        uni,
        [
            (p, w, _math.log2(int(f) / ctx[p]))
            for p, w, f in bi_rows
            if p in ctx
        ],
        _math.log2(BACKOFF),
    )
    return f"""
    WITH m(word, logp) AS (VALUES {unigram_model_sql_values(uni)}),
    bm(prev, word, bi_logp) AS (VALUES {bigram_model_sql_values(blm)}),
    lsts AS (
      SELECT doc_id, list_filter({split}, w -> w <> '') AS lst
      FROM documents WHERE text IS NOT NULL),
    first_scored AS (
      SELECT doc_id, coalesce(m.logp, {uni.oov_logp!r}) AS lp
      FROM (SELECT doc_id, lst[1] AS word FROM lsts WHERE len(lst) >= 1) f
      LEFT JOIN m USING (word)),
    pairs AS (
      SELECT doc_id, p[1] AS prev, p[2] AS word
      FROM (SELECT doc_id,
                   unnest(list_zip(lst[1:len(lst)-1], lst[2:len(lst)])) AS p
            FROM lsts WHERE len(lst) >= 2)),
    pair_scored AS (
      SELECT pairs.doc_id,
             coalesce(bm.bi_logp,
                      {blm.backoff_logp!r} + coalesce(m.logp, {uni.oov_logp!r})) AS lp
      FROM pairs
      LEFT JOIN bm ON pairs.prev = bm.prev AND pairs.word = bm.word
      LEFT JOIN m ON pairs.word = m.word),
    scored AS (
      SELECT doc_id, count(*) AS n_words, avg(-lp) AS bpw
      FROM (SELECT * FROM first_scored UNION ALL SELECT * FROM pair_scored)
      GROUP BY doc_id),
    per_doc AS (
      SELECT d.doc_id, d.source, coalesce(s.n_words, 0) AS n_words, s.bpw
      FROM documents d LEFT JOIN scored s USING (doc_id))
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           round(avg(bpw), 4) AS avg_bits_per_word
    FROM per_doc GROUP BY source ORDER BY source
    """


_BPE_PACK_BUDGET = 2048


def _docs_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize-then-pack pipeline end to end: train BPE on the
    corpus, count LEARNED tokens per doc (not the n_chars proxy), pack
    into token-budget bins, roll up per shard. Certifies the real
    pretraining composition — tokenizer fit → Arrow encode → window
    packing — in one value-checked result. Never gate-registered."""
    from etl_instagram_spark.operators.packing import pack_cumsum
    from etl_instagram_spark.operators.tokenizer import bpe_token_count, fit_bpe
    from etl_instagram_spark.plans import llm_queries as LQ

    docs = _t(spark, sf_dir, "documents")
    merges = fit_bpe(
        docs, "text", n_merges=LQ._BPE_N_MERGES, max_words=LQ._BPE_MAX_WORDS
    )
    counts = docs.select(
        "doc_id", bpe_token_count("text", merges).alias("bpe_t")
    )
    packed = pack_cumsum(
        counts, "doc_id", "bpe_t", budget=_BPE_PACK_BUDGET, shards=LQ._PACK_SHARDS
    )
    per_bin = packed.groupBy("shard", "bin_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe_t").alias("bin_tokens"),
    )
    return (
        per_bin.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("bin_tokens").alias("sum_tokens"),
            F.max("bin_tokens").alias("max_bin_tokens"),
        )
        .orderBy("shard")
    )


def _sql_bpe_pack() -> str:
    from etl_instagram_spark.plans import llm_queries as LQ

    split, wm = LQ._bpe_fit_word_map()
    b = _BPE_PACK_BUDGET
    return f"""
    WITH wm(word, nt) AS (VALUES {wm}),
    dw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest({split}) AS w
        FROM documents WHERE text IS NOT NULL)
      WHERE w <> ''),
    counts AS (
      SELECT d.doc_id, coalesce(sum(wm.nt), 0) AS t
      FROM documents d
      LEFT JOIN dw x ON d.doc_id = x.doc_id
      LEFT JOIN wm ON x.w = wm.word
      GROUP BY d.doc_id),
    base AS (
      SELECT doc_id, t, {LQ._sql_pack_shard("doc_id")} AS shard FROM counts),
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
      FROM binned GROUP BY shard, bin_idx)
    SELECT shard, count(*) AS n_bins,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(bin_tokens) AS BIGINT) AS sum_tokens,
           max(bin_tokens) AS max_bin_tokens
    FROM bins GROUP BY shard ORDER BY shard
    """


_SQL_EVENTS_GAPFILL = """
    WITH obs AS (
      SELECT event_type AS key,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS b,
             count(*) AS n_obs, round(avg(value), 6) AS value_obs
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT key, CAST(min(b) / 3600 AS BIGINT) AS lo,
             CAST(max(b) / 3600 AS BIGINT) AS hi
      FROM obs GROUP BY key),
    grid AS (
      SELECT key, unnest(generate_series(lo, hi)) * 3600 AS b FROM bounds),
    g AS (
      SELECT grid.key, grid.b, obs.n_obs, obs.value_obs
      FROM grid LEFT JOIN obs ON grid.key = obs.key AND grid.b = obs.b),
    w AS (
      SELECT key, b, n_obs, value_obs,
             last_value(value_obs IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             last_value(CASE WHEN value_obs IS NOT NULL THEN b END IGNORE NULLS)
               OVER (PARTITION BY key ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
             first_value(value_obs IGNORE NULLS) OVER (
               PARTITION BY key ORDER BY b
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(CASE WHEN value_obs IS NOT NULL THEN b END IGNORE NULLS)
               OVER (PARTITION BY key ORDER BY b
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
      FROM g)
    SELECT key AS event_type, make_timestamp(b * 1000000) AS bucket_ts,
           coalesce(n_obs, 0) AS n_obs, value_obs,
           prev_v AS value_locf,
           CASE WHEN value_obs IS NOT NULL THEN value_obs
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN round(prev_v + (next_v - prev_v)
                           * ((b - prev_b) / nullif(next_b - prev_b, 0)), 6)
                ELSE prev_v END AS value_linear
    FROM w ORDER BY event_type, bucket_ts
    """


def _events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled events per type, LOCF + linear (the
    time_bucket_gapfill shape, operators/temporal.gapfill). Grid size is
    O(keys × buckets) regardless of event count. Never gate-registered;
    the mirror replays bucketing, per-key grids, and both fills with
    IGNORE-NULLS windows."""
    from etl_instagram_spark.operators.temporal import gapfill

    return gapfill(_t(spark, sf_dir, "events"), bucket="1 hour").orderBy(
        "event_type", "bucket_ts"
    )


_SQL_EVENTS_ANOMALIES = """
    WITH scored AS (
      SELECT event_type, ts, event_id, value,
             round((value - avg(value) OVER w)
                   / nullif(stddev_samp(value) OVER w, 0.0), 4) AS z_score
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN abs(z_score) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies,
           round(max(abs(z_score)), 4) AS max_abs_z
    FROM scored GROUP BY event_type ORDER BY event_type
    """


def _events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly profile per event type
    (temporal.rolling_zscore, lookback 100, |z| > 3). Never
    gate-registered; the mirror replays the trailing window, the
    sample-stddev guard, and the flag threshold."""
    from etl_instagram_spark.operators.temporal import rolling_zscore

    scored = rolling_zscore(_t(spark, sf_dir, "events"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("is_anomaly"), 1).otherwise(0)).alias("n_anomalies"),
            F.round(F.max(F.abs(F.col("z_score"))), 4).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


_SQL_CUST_RANK_DIST = """
    WITH rev AS (
      SELECT o_custkey AS c_custkey, round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY o_custkey)
    SELECT c_custkey, revenue,
           round(percent_rank() OVER (ORDER BY revenue DESC, c_custkey), 6)
             AS pct_rank,
           round(cume_dist() OVER (ORDER BY revenue DESC, c_custkey), 6)
             AS cum_dist
    FROM rev ORDER BY c_custkey
    """


def _customer_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over customer revenue — the two rank
    distributions no other inventory window uses (rank/lag/ntile/frames
    are covered elsewhere). Never gate-registered."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return rev.select(
        "c_custkey",
        "revenue",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    ).orderBy("c_custkey")


# the threshold derives from an exact DECIMAL sum (o_totalprice is a 2dp
# grid column): a float avg's summation-order ulps could otherwise flip
# the comparison for an order priced exactly at 1.5x the mean
_SQL_ABOVE_CUST_AVG = """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT 1.5 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                        / count(*))
                          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """


def _orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery (each order against its own customer's
    average) — the decorrelation surface no other inventory query
    exercises (the gate's correlated shapes are EXISTS/IN semi-joins).
    Catalyst rewrites it to an aggregate + join; the same ANSI text runs
    on both engines. Never gate-registered."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_ABOVE_CUST_AVG)


_SPAN_N = 13


def _docs_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicate-span removal over the real documents
    table (operators/cleanup.remove_duplicate_spans at n=13): per doc,
    the md5 of the post-removal text plus the removal counts. The md5
    pins every surviving byte — untouched docs must round-trip their
    ORIGINAL text exactly, edited docs must drop exactly the covered
    words — while keeping the compared frame narrow. Never
    gate-registered (EXTRAS has no row cap)."""
    from etl_instagram_spark.operators.cleanup import remove_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = remove_duplicate_spans(docs, "doc_id", "text", n=_SPAN_N)
    return out.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit("<NULL>"))).alias("text_md5"),
        "n_spans_removed",
        "n_words_removed",
    ).orderBy("doc_id")


_SQL_SPAN_DEDUP = f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
    ),
    lists AS (  -- the class is spelled out because Java's \\s (the Spark
                -- side) includes \\x0B while RE2's does not (text.py note)
      SELECT doc_id,
             string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS l
      FROM docs WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    w AS (  -- (doc, pos, word): 1-based positions via aligned unnest +
            -- generate_subscripts (DuckDB 1.0.0 lacks WITH ORDINALITY)
      SELECT doc_id, unnest(l) AS word, generate_subscripts(l, 1) AS pos
      FROM lists
    ),
    counts AS (SELECT doc_id, max(pos) AS n_words FROM w GROUP BY doc_id),
    sp AS (  -- every n-word window, hashed over lowercased words
      SELECT w.doc_id, w.pos AS start,
             md5(string_agg(lower(w2.word), ' ' ORDER BY w2.pos)) AS h
      FROM w JOIN w w2
        ON w2.doc_id = w.doc_id AND w2.pos BETWEEN w.pos AND w.pos + {_SPAN_N - 1}
      JOIN counts c ON c.doc_id = w.doc_id
      WHERE w.pos <= c.n_words - {_SPAN_N - 1}
      GROUP BY w.doc_id, w.pos
    ),
    ranked AS (
      SELECT doc_id, start,
             count(*)     OVER (PARTITION BY h) AS cnt,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
      FROM sp
    ),
    removals AS (  -- every occurrence except the smallest (doc, start)
      SELECT doc_id, start FROM ranked WHERE cnt >= 2 AND rn > 1
    ),
    covered AS (  -- word positions inside any removed occurrence
      SELECT DISTINCT r.doc_id, w.pos
      FROM removals r JOIN w
        ON w.doc_id = r.doc_id
       AND w.pos BETWEEN r.start AND r.start + {_SPAN_N - 1}
    ),
    rebuilt AS (
      SELECT w.doc_id,
             string_agg(w.word, ' ' ORDER BY w.pos)
               FILTER (WHERE c.pos IS NULL) AS new_text,
             count(c.pos) AS n_words_removed
      FROM w LEFT JOIN covered c
        ON c.doc_id = w.doc_id AND c.pos = w.pos
      GROUP BY w.doc_id
    ),
    nrem AS (SELECT doc_id, count(*) AS n_spans_removed FROM removals GROUP BY doc_id)
    SELECT d.doc_id,
           md5(coalesce(
             CASE WHEN nrem.doc_id IS NULL THEN d.text
                  ELSE coalesce(rebuilt.new_text, '') END,
             '<NULL>')) AS text_md5,
           coalesce(nrem.n_spans_removed, 0) AS n_spans_removed,
           CASE WHEN nrem.doc_id IS NULL THEN 0
                ELSE rebuilt.n_words_removed END AS n_words_removed
    FROM docs d
    LEFT JOIN nrem    ON nrem.doc_id = d.doc_id
    LEFT JOIN rebuilt ON rebuilt.doc_id = d.doc_id
    ORDER BY d.doc_id
    """


def _docs_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing certified end-to-end
    (operators/lm.perplexity_buckets, by="lang"): per document the
    rounded bits-per-word plus its within-language percent_rank bucket.
    The mirror re-fits the unigram model from DuckDB's counts (same pure
    math, identical inlined doubles — the docs_unigram_ppl pattern) and
    replays the tertile cut as window SQL over the same deterministic
    (bits_per_word, doc_id) order. Wordless docs keep a NULL bucket.
    Never gate-registered (EXTRAS has no row cap)."""
    from etl_instagram_spark.operators.lm import fit_unigram_lm, perplexity_buckets

    docs = _t(spark, sf_dir, "documents")
    lm = fit_unigram_lm(docs)
    out = perplexity_buckets(docs, lm, by="lang")
    return out.select(
        "doc_id",
        "lang",
        "n_words",
        F.round("bits_per_word", 4).alias("bits_per_word"),
        "ppl_bucket",
    ).orderBy("doc_id")


def _sql_perplexity_buckets() -> str:
    import os

    import duckdb

    from etl_instagram_spark.operators.lm import (
        unigram_lm_from_freqs,
        unigram_model_sql_values,
    )
    from etl_instagram_spark.operators.tokenizer import WORD_SPLIT_REGEX

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "documents.parquet")
    split = f"string_split_regex(lower(text), '{WORD_SPLIT_REGEX}')"
    con = duckdb.connect()
    freqs = con.sql(
        f"""
        SELECT w AS word, count(*) AS freq
        FROM (SELECT unnest({split}) AS w FROM '{path}' WHERE text IS NOT NULL)
        WHERE w <> ''
        GROUP BY w ORDER BY freq DESC, word ASC LIMIT 65536
        """
    ).fetchall()
    con.close()
    lm = unigram_lm_from_freqs([(w, int(f)) for w, f in freqs])
    lo, hi = 1 / 3, 2 / 3  # perplexity_buckets' default cuts, same doubles
    return f"""
    WITH m(word, logp) AS (VALUES {unigram_model_sql_values(lm)}),
    dw AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest({split}) AS w
        FROM documents WHERE text IS NOT NULL)
      WHERE w <> ''),
    scored AS (
      SELECT dw.doc_id, count(*) AS n_words,
             avg(-coalesce(m.logp, {lm.oov_logp!r})) AS bpw
      FROM dw LEFT JOIN m ON dw.w = m.word GROUP BY dw.doc_id),
    per_doc AS (
      SELECT d.doc_id, d.lang, coalesce(s.n_words, 0) AS n_words, s.bpw
      FROM documents d LEFT JOIN scored s USING (doc_id)),
    ranked AS (
      SELECT doc_id, lang, n_words, bpw,
             percent_rank() OVER (
               PARTITION BY lang ORDER BY bpw, doc_id) AS pr
      FROM per_doc WHERE n_words > 0)
    SELECT doc_id, lang, n_words, round(bpw, 4) AS bits_per_word,
           CASE WHEN pr <= {lo!r} THEN 'head'
                WHEN pr <= {hi!r} THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM ranked
    UNION ALL
    SELECT doc_id, lang, n_words, CAST(NULL AS DOUBLE) AS bits_per_word,
           CAST(NULL AS VARCHAR) AS ppl_bucket
    FROM per_doc WHERE NOT (n_words > 0)
    ORDER BY doc_id
    """


def _docs_gopher_ngram_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nine Gopher n-gram repetition rules (cleanup.
    gopher_ngram_filter at paper-default thresholds) certified
    cross-engine: per document the 9 violation booleans plus the
    all-rules pass. The Python differential in test_cleanup pins the
    span-coverage arithmetic; THIS row replays it in a second engine —
    DuckDB recomputes every top/dup char fraction from scratch with
    window SQL + list functions (the fractions are integer/integer
    divisions, so the > threshold comparisons agree exactly). Never
    gate-registered."""
    from etl_instagram_spark.operators.cleanup import gopher_ngram_filter

    docs = _t(spark, sf_dir, "documents")
    out = gopher_ngram_filter(docs, "text")
    keep = [c for c in out.columns if c.startswith("fail_")] + [
        "gopher_ngram_pass"
    ]
    return out.select("doc_id", *keep).orderBy("doc_id")


def _sql_gopher_ngram_flags() -> str:
    from etl_instagram_spark.operators.cleanup import (
        GOPHER_DUP_NGRAM_DEFAULTS,
        GOPHER_TOP_NGRAM_DEFAULTS,
    )

    # same whitespace class as the Spark tokenizer (Java \s, spelled out)
    split = (
        "list_filter(string_split_regex(trim(lower(coalesce(text, ''))), "
        "'[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')"
    )
    ctes = [
        "docs AS (SELECT doc_id, text FROM documents)",
        f"toks AS (SELECT doc_id, {split} AS l FROM docs)",
        "w AS (SELECT doc_id, unnest(l) AS word,"
        " generate_subscripts(l, 1) AS pos FROM toks)",
        "total AS (SELECT doc_id, sum(length(word)) AS total_chars"
        " FROM w GROUP BY doc_id)",
    ]
    joins, flags = [], []
    all_ns = sorted(GOPHER_TOP_NGRAM_DEFAULTS) + sorted(GOPHER_DUP_NGRAM_DEFAULTS)
    for n in sorted(set(all_ns)):
        # windows j = 1..len-n+1; gram = space-joined n-token slice
        ctes.append(
            f"pos{n} AS (SELECT doc_id, l,"
            f" unnest(range(1, len(l) - {n} + 2)) AS j FROM toks)"
        )
        ctes.append(
            f"ng{n} AS (SELECT doc_id, j,"
            f" array_to_string(l[j:j + {n - 1}], ' ') AS gram FROM pos{n})"
        )
        ctes.append(
            f"cnt{n} AS (SELECT doc_id, gram, count(*) AS c"
            f" FROM ng{n} GROUP BY doc_id, gram)"
        )
    for n, cap in sorted(GOPHER_TOP_NGRAM_DEFAULTS.items()):
        # best = max count; arg = lexicographically smallest maximal gram
        # (== the first maximal equal-run of the Spark sorted-array fold)
        ctes.append(
            f"top{n} AS (SELECT doc_id, c AS best, gram AS arg FROM"
            f" (SELECT doc_id, gram, c, row_number() OVER"
            f" (PARTITION BY doc_id ORDER BY c DESC, gram ASC) AS r"
            f" FROM cnt{n}) WHERE r = 1)"
        )
        ctes.append(
            f"topfrac{n} AS (SELECT t.doc_id,"
            f" CAST(p.best * (length(p.arg) - {n - 1}) AS DOUBLE)"
            f" / t.total_chars AS frac"
            f" FROM total t JOIN top{n} p USING (doc_id)"
            f" WHERE t.total_chars > 0)"
        )
        joins.append(f"LEFT JOIN topfrac{n} ON topfrac{n}.doc_id = d.doc_id")
        flags.append(
            (f"fail_top_{n}gram_chars", f"coalesce(topfrac{n}.frac, 0) > {cap!r}")
        )
    for n, cap in sorted(GOPHER_DUP_NGRAM_DEFAULTS.items()):
        # covered word i <=> some duplicated window j in [i-n+1, i]
        ctes.append(
            f"dupw{n} AS (SELECT g.doc_id, g.j FROM ng{n} g"
            f" JOIN cnt{n} c ON c.doc_id = g.doc_id AND c.gram = g.gram"
            f" WHERE c.c >= 2)"
        )
        ctes.append(
            f"cov{n} AS (SELECT DISTINCT w.doc_id, w.pos FROM dupw{n} dw"
            f" JOIN w ON w.doc_id = dw.doc_id"
            f" AND w.pos BETWEEN dw.j AND dw.j + {n - 1})"
        )
        ctes.append(
            f"dupfrac{n} AS (SELECT c.doc_id,"
            f" CAST(sum(length(w.word)) AS DOUBLE)"
            f" / any_value(t.total_chars) AS frac"
            f" FROM cov{n} c JOIN w ON w.doc_id = c.doc_id AND w.pos = c.pos"
            f" JOIN total t ON t.doc_id = c.doc_id"
            f" WHERE t.total_chars > 0 GROUP BY c.doc_id)"
        )
        joins.append(f"LEFT JOIN dupfrac{n} ON dupfrac{n}.doc_id = d.doc_id")
        flags.append(
            (f"fail_dup_{n}gram_chars", f"coalesce(dupfrac{n}.frac, 0) > {cap!r}")
        )
    cols = ",\n           ".join(f"{expr} AS {name}" for name, expr in flags)
    ok = " AND ".join(f"NOT ({expr})" for _, expr in flags)
    return (
        "WITH " + ",\n    ".join(ctes) + "\n"
        f"    SELECT d.doc_id,\n           {cols},\n"
        f"           ({ok}) AS gopher_ngram_pass\n"
        "    FROM docs d\n    "
        + "\n    ".join(joins)
        + "\n    ORDER BY d.doc_id"
    )


def _docs_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling certified end-to-end (operators/dsir):
    fit the hashed-ngram importance-ratio model with the English slice
    as the target domain, Gumbel-top-25 sample the corpus, return each
    selected doc's rounded log-weight and sampling key. The mirror
    re-fits the model from DuckDB's OWN feature counts through the same
    pure math (identical inlined doubles — the lm.py contract), so the
    row certifies the engine-neutral feature hashing, the counting, the
    weight sums, and the deterministic Gumbel coupling at once. Never
    gate-registered."""
    from etl_instagram_spark.operators.dsir import fit_dsir, importance_sample

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    model = fit_dsir(docs, target, n_buckets=1024)
    sel = importance_sample(docs, model, k=25)
    return sel.select(
        "doc_id", "lang", "log_weight", "sample_key"
    ).orderBy("doc_id")


def _sql_dsir_selection() -> str:
    import os

    import duckdb

    from etl_instagram_spark.operators.dsir import dsir_model_from_counts

    n_buckets = 1024
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "documents.parquet")
    split = (
        "list_filter(string_split_regex(trim(lower(coalesce(text, ''))), "
        "'[ \\t\\n\\x0B\\f\\r]+'), t -> t <> '')"
    )
    feats = f"""
    WITH toks AS (SELECT doc_id, lang, {split} AS l FROM "{{src}}"),
    grams AS (
      SELECT doc_id, unnest(l) AS g FROM toks
      UNION ALL
      SELECT doc_id, l[j] || ' ' || l[j + 1] AS g
      FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS j FROM toks)),
    feats AS (
      SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % {n_buckets}
               AS bucket
      FROM grams)
    """
    con = duckdb.connect()

    def counts(where: str) -> dict[int, int]:
        rows = con.sql(
            feats.replace("{src}", path)
            + f"SELECT bucket, count(*) FROM feats "
            f"WHERE doc_id IN (SELECT doc_id FROM '{path}' {where}) "
            f"GROUP BY bucket"
        ).fetchall()
        return {int(b): int(c) for b, c in rows}

    raw = counts("")
    tgt = counts("WHERE lang = 'en'")
    con.close()
    model = dsir_model_from_counts(raw, tgt, n_buckets)
    # CAST: a bare decimal literal parses as DECIMAL in DuckDB, which
    # would sum in decimal arithmetic instead of the engine's doubles
    mvals = ", ".join(
        f"({b}, CAST({lr!r} AS DOUBLE))" for b, lr in enumerate(model.log_ratios)
    )
    return (
        feats.replace('"{src}"', "documents")
        + f""",
    m(bucket, lr) AS (VALUES {mvals}),
    w AS (SELECT doc_id, sum(lr) AS log_weight
          FROM feats JOIN m USING (bucket) GROUP BY doc_id),
    keyed AS (
      SELECT doc_id, log_weight,
             log_weight + -ln(-ln(
               (('0x' || substr(md5(doc_id::VARCHAR || ':dsir'), 1, 8))::BIGINT
                + 1) / 4294967297.0)) AS skey
      FROM w),
    top AS (SELECT doc_id, log_weight, skey FROM keyed
            ORDER BY skey DESC, doc_id LIMIT 25)
    SELECT d.doc_id, d.lang, round(t.log_weight, 6) AS log_weight,
           round(t.skey, 6) AS sample_key
    FROM top t JOIN documents d USING (doc_id)
    ORDER BY d.doc_id
    """
    )


def _top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 rotation (for docs_dup_cluster_reps): row_number top-k per
    group — the shape stays gated via docs_bm25_topk (and
    customer_revenue_quartiles until its own r11 rotation; both remain
    EXTRAS-checked)."""
    from etl_instagram_spark.plans.queries import top3_orders_per_customer

    return top3_orders_per_customer(spark, sf_dir)


def _nation_customer_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 rotation (for graph_pagerank_suppliers): listagg — sorted
    collect_list stays gated via docs_top_terms_by_lang."""
    from etl_instagram_spark.plans.llm_queries import nation_customer_listagg

    return nation_customer_listagg(spark, sf_dir)


def _part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r10 rotation (for docs_leakage_safe_split): unpivot/Expand."""
    from etl_instagram_spark.plans.llm_queries import part_metrics_unpivot

    return part_metrics_unpivot(spark, sf_dir)


def _order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 rotation (for emb_kmeans_cells): LAG-window date arithmetic —
    offset windows stay exercised here at driver-grade parity; date
    arithmetic stays gated via customer_rolling_30d_revenue /
    events_asof_join."""
    from etl_instagram_spark.plans.queries import order_gap_days

    return order_gap_days(spark, sf_dir)


def _graph_ppr_building_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): PERSONALIZED PageRank — teleport mass confined
    to BUILDING-segment customers, ranking suppliers as seen from that
    segment (the seeded-importance shape: rank a neighborhood from a
    trusted subset). Same int64 kernel as the gate row
    graph_pagerank_suppliers; the mirror replays seeds, init, and every
    iteration in one standalone DuckDB statement."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        pagerank,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cu = _t(spark, sf_dir, "customer")
    seeds = cu.filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") * 2).alias("id")
    )
    ranks = pagerank(bipartite_order_edges(od, li), n_iter=3, seeds=seeds)
    return (
        ranks.filter(F.col("id") % 2 == 1)
        .select(F.expr("(id - 1) div 2").alias("s_suppkey"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "s_suppkey")
        .limit(15)
    )


def _sql_ppr_building_suppliers() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_SQL,
        pagerank_oracle_sql,
    )

    ctes = pagerank_oracle_sql(
        BIPARTITE_ORDER_EDGES_SQL,
        n_iter=3,
        seeds_sql=(
            "SELECT 2 * c_custkey FROM customer"
            " WHERE c_mktsegment = 'BUILDING'"
        ),
    )
    return f"""
    WITH {ctes}
    SELECT (id - 1) // 2 AS s_suppkey, rank_micro
    FROM r3 WHERE id % 2 = 1
    ORDER BY rank_micro DESC, s_suppkey
    LIMIT 15
    """


def _graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): WEIGHTED PageRank — the walk follows edges in
    proportion to order-line counts (interaction intensity), so heavy
    trading pairs pull rank. Same int64 kernel; per-edge contrib
    (rank·w) div W(u) replayed whole in DuckDB."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        pagerank,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ranks = pagerank(
        bipartite_order_edges(od, li, weighted=True), n_iter=3, weight_col="w"
    )
    return (
        ranks.filter(F.col("id") % 2 == 1)
        .select(F.expr("(id - 1) div 2").alias("s_suppkey"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "s_suppkey")
        .limit(15)
    )


def _sql_pagerank_weighted() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_WEIGHTED_SQL,
        pagerank_oracle_sql,
    )

    ctes = pagerank_oracle_sql(
        BIPARTITE_ORDER_EDGES_WEIGHTED_SQL, n_iter=3, weighted=True
    )
    return f"""
    WITH {ctes}
    SELECT (id - 1) // 2 AS s_suppkey, rank_micro
    FROM r3 WHERE id % 2 = 1
    ORDER BY rank_micro DESC, s_suppkey
    LIMIT 15
    """


def _events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): HyperLogLog distinct event_ids per event_type
    (operators/sketches.py) with the exact count as contrast — register
    state (buckets_hit), the EXACT integer harmonic sum, and the raw
    estimate all replay bit-for-bit in DuckDB; the sketch uses the
    engine-neutral md5 hash and an integer-comparison rho chain, so
    unlike approx_count_distinct it is second-system-checkable."""
    from etl_instagram_spark.operators.sketches import hll_summary

    ev = _t(spark, sf_dir, "events")
    sk = hll_summary(ev, "event_id", ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("exact_distinct")
    )
    return sk.join(exact, "event_type").orderBy("event_type")


def _sql_events_hll_distinct() -> str:
    from etl_instagram_spark.operators.sketches import hll_summary_sql

    inner = hll_summary_sql("event_id", "events", ["event_type"])
    return f"""
    WITH sk AS ({inner}),
    ex AS (SELECT event_type, count(DISTINCT event_id) AS exact_distinct
           FROM events GROUP BY event_type)
    SELECT sk.event_type, buckets_hit, sum_scaled, hll_estimate,
           exact_distinct
    FROM sk JOIN ex ON sk.event_type = ex.event_type
    ORDER BY sk.event_type
    """


def _graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): redistribute-dangling PageRank over the
    DIRECTED customer→supplier order graph — every supplier is a
    dangling sink, so this row exercises the standard-formulation
    per-round dangling-mass redistribution end to end (int64 share =
    D div N, replayed as a scalar-subquery CTE per round in DuckDB).
    Ranks customers by how much supplier-bounced mass flows back to
    them via the uniform share."""
    from etl_instagram_spark.operators.graph import pagerank

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = od.join(li, od.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    ranks = pagerank(edges, n_iter=3, redistribute_dangling=True)
    return (
        ranks.filter(F.col("id") % 2 == 0)
        .select(F.expr("id div 2").alias("c_custkey"), "rank_micro")
        .orderBy(F.col("rank_micro").desc(), "c_custkey")
        .limit(15)
    )


def _sql_graph_pagerank_dangling() -> str:
    from etl_instagram_spark.operators.graph import pagerank_oracle_sql

    ctes = pagerank_oracle_sql(
        "SELECT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst"
        " FROM orders JOIN lineitem ON l_orderkey = o_orderkey",
        n_iter=3,
        redistribute_dangling=True,
    )
    return f"""
    WITH {ctes}
    SELECT id // 2 AS c_custkey, rank_micro
    FROM r3 WHERE id % 2 = 0
    ORDER BY rank_micro DESC, c_custkey
    LIMIT 15
    """


def _customer_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 rotation (gate seat given to part_entity_resolution — the
    driver now certifies the ER family directly): percentile-boundary
    broadcast bucketing; the shape stays gated via
    events_value_percentiles and docs_bm25_topk."""
    from etl_instagram_spark.plans.llm_queries import (
        customer_revenue_quartiles,
    )

    return customer_revenue_quartiles(spark, sf_dir)


def _part_entity_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): SORTED-NEIGHBORHOOD entity blocking
    (operators/entity.sorted_neighborhood_pairs) — pair volume exactly
    n·(window−1) by construction, the hot-block-proof alternative to
    key blocking. The oracle replays the GLOBAL rank (bucket-offset on
    the Spark side, plain row_number in DuckDB), the rank-shifted
    window pairing, and the levenshtein verify, certified by
    order-independent checksums over the full verified pair set (the
    events_ewma convention — every pair contributes, no row emission).
    CC clustering over SNM pairs is deliberately NOT replayed here:
    sorted-name chains form deep graphs beyond any fixed CTE round
    budget (the lcc convergence assert fires, loudly, as designed);
    the engine side uses the O(log n) alternating-star CC, and the CC
    kernel itself is gate-certified via part_entity_resolution /
    docs_dup_cluster_reps."""
    from etl_instagram_spark.operators.entity import (
        sorted_neighborhood_pairs,
    )

    pa = _t(spark, sf_dir, "part")
    pairs = sorted_neighborhood_pairs(
        pa, "p_partkey", "p_name", window=4, max_dist=3
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("id_a").alias("a_checksum"),
        F.sum("id_b").alias("b_checksum"),
        F.countDistinct("id_a").alias("n_distinct_a"),
        F.countDistinct("id_b").alias("n_distinct_b"),
    )


def _sql_part_entity_snm() -> str:
    from etl_instagram_spark.operators.entity import sorted_neighborhood_sql

    snm = sorted_neighborhood_sql(
        "SELECT p_partkey, p_name FROM part", window=4, max_dist=3
    )
    return f"""
    WITH {snm}
    SELECT count(*) AS n_pairs,
           (sum(ia))::BIGINT AS a_checksum,
           (sum(ib))::BIGINT AS b_checksum,
           count(DISTINCT ia) AS n_distinct_a,
           count(DISTINCT ib) AS n_distinct_b
    FROM verified
    """


def _docs_token_weighted_length_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Never-gated (r13): WEIGHTED dyadic-CM quantiles
    (operators/sketches.dcm_sketch weight_col, the r13 face) — per-lang
    doc-length quantiles weighted by TOKEN MASS: "the length below
    which a quarter/half/three-quarters of the corpus TOKENS sit", the
    packing/budgeting statistic, not the per-document median. Weights
    ride the shared token kernel (functions.text.tokens ↔ SQL_TOKS, the
    same certified pair the token-stats gate row uses), registers and
    the full descent replay bit-for-bit in DuckDB, and
    ``exact_wt_below`` contrasts each answer with the true token mass
    strictly below it — certifying the weighted quantile against the
    DATA. Scale: same register-bounded shuffle as the unweighted
    sketch; the contrast join broadcasts the tiny quantile frame."""
    from etl_instagram_spark.functions.text import token_count
    from etl_instagram_spark.operators.sketches import (
        dcm_quantiles,
        dcm_sketch,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("long").alias("v"),
        token_count(F.col("text")).cast("long").alias("wt"),
    )
    sk = dcm_sketch(docs, "v", ["lang"], weight_col="wt")
    qs = dcm_quantiles(
        sk, [(1, 4), (1, 2), (3, 4)], ["lang"]
    ).localCheckpoint(eager=True)  # reused: output + contrast probe
    exact = (
        F.broadcast(qs.select("lang", "q_num", "q_den", "q_value"))
        .join(docs, "lang")
        .filter(F.col("v") < F.col("q_value"))
        .groupBy("lang", "q_num", "q_den")
        .agg(F.sum("wt").cast("long").alias("exact_wt_below"))
    )
    return (
        qs.join(exact, ["lang", "q_num", "q_den"], "left")
        .withColumn(
            "exact_wt_below",
            F.coalesce("exact_wt_below", F.lit(0)).cast("long"),
        )
        .select(
            "lang", "q_num", "q_den", "n", "target", "q_value",
            "exact_wt_below",
        )
        .orderBy("lang", "q_den", "q_num")
    )


def _sql_docs_token_weighted_length_quantiles() -> str:
    from etl_instagram_spark.operators.sketches import (
        dcm_quantiles_sql,
        dcm_sketch_sql,
    )
    from etl_instagram_spark.plans.llm_queries import SQL_TOKS

    wt = f"len({SQL_TOKS})"
    sk = dcm_sketch_sql(
        "n_chars", "documents", ["lang"], weight_expr=wt
    )
    ctes = dcm_quantiles_sql(sk, [(1, 4), (1, 2), (3, 4)], ["lang"])
    return f"""
    WITH {ctes},
    dv AS (SELECT lang, n_chars::BIGINT AS v, ({wt})::BIGINT AS wt
           FROM documents WHERE n_chars IS NOT NULL),
    exact AS (SELECT q.lang, q.q_num, q.q_den,
                     (sum(d.wt) FILTER (d.v < q.q_value))::BIGINT
                       AS exact_wt_below
              FROM qout q JOIN dv d ON d.lang = q.lang
              GROUP BY q.lang, q.q_num, q.q_den)
    SELECT q.lang, q.q_num, q.q_den, q.n, q.target, q.q_value,
           COALESCE(x.exact_wt_below, 0)::BIGINT AS exact_wt_below
    FROM qout q LEFT JOIN exact x
      ON x.lang = q.lang AND x.q_num = q.q_num AND x.q_den = q.q_den
    ORDER BY q.lang, q.q_den, q.q_num
    """


def _docs_token_weighted_domain_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Never-gated (r13): WEIGHTED exact heavy hitters
    (operators/frequency.heavy_hitters weight_col, the r13 mode) —
    sources holding ≥ 1/21 of the corpus's TOKEN MASS, not 1/21 of its
    documents: the corpus-concentration audit a mixture designer runs
    before capping. At sf0.01 the 20 uniform-ish sources straddle the
    4.76 % line (16 pass, 4 fail), so the integer threshold
    ``sum(w)·den ≥ W·num`` is exercised at the boundary, where a float
    compare would drift. Weights ride the shared token kernel
    (functions.text.token_count ↔ len(SQL_TOKS)). Scale: two scans +
    one ≤ capacity·partitions-row summary — the term domain is never
    shuffled; weighted-MG candidates keep the no-false-negative
    guarantee against weight shares (averaging argument is
    weight-agnostic)."""
    from etl_instagram_spark.functions.text import token_count
    from etl_instagram_spark.operators.frequency import heavy_hitters

    docs = _t(spark, sf_dir, "documents").select(
        "source", token_count(F.col("text")).cast("long").alias("__wt")
    )
    return heavy_hitters(
        docs, "source", 1, 21, out_count_col="n_tokens", weight_col="__wt"
    ).orderBy(F.col("n_tokens").desc(), "source")


def _sql_docs_token_weighted_domain_hitters() -> str:
    from etl_instagram_spark.plans.llm_queries import SQL_TOKS

    wt = f"len({SQL_TOKS})"
    # source IS NOT NULL mirrors the Spark operator's null-term
    # semantics: mg_summary drops null terms from both the candidate
    # set and the total weight W, so NULL-source token mass must not
    # inflate the SQL side's W either (r13 ADVICE).
    return f"""
    WITH d AS (SELECT source, ({wt})::BIGINT AS wt FROM documents
               WHERE source IS NOT NULL)
    SELECT source, (sum(wt))::BIGINT AS n_tokens
    FROM d GROUP BY source
    HAVING sum(wt) * 21 >= (SELECT sum(wt) FROM d) * 1
    ORDER BY n_tokens DESC, source
    """


def _docs_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): systematic PPS sampling
    (operators/sampling.pps_sample) — a fixed budget of 300 draws from
    the documents pool weighted by n_chars, selection a pure int64
    grid walk over the hash-shuffled cumulative-weight line; the whole
    sample (ids AND multiplicities) replays bit-for-bit in DuckDB."""
    from etl_instagram_spark.operators.sampling import pps_sample

    docs = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        pps_sample(docs, "doc_id", "n_chars", n=300)
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


def _sql_docs_pps_sample() -> str:
    from etl_instagram_spark.operators.sampling import pps_sample_sql

    ctes = pps_sample_sql(
        "SELECT doc_id, n_chars FROM documents WHERE n_chars > 0",
        "doc_id",
        "n_chars",
        n=300,
    )
    return f"""
    WITH {ctes}
    SELECT id AS doc_id, n_copies FROM pps ORDER BY doc_id
    """


def _part_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): k-core decomposition (operators/graph.k_core)
    — the dense co-purchase backbone after synchronously peeling
    sub-k-degree nodes to a fixpoint. The oracle replays the same peel
    as fixed-round MATERIALIZED CTEs with a LOUD convergence assert
    (too-shallow budgets error out, never silently certify a
    half-peeled graph)."""
    from etl_instagram_spark.operators.graph import copurchase_edges, k_core

    li = _t(spark, sf_dir, "lineitem")
    core = k_core(copurchase_edges(li, min_orders=2), k=3)
    return core.orderBy(F.col("core_degree").desc(), "id").limit(50)


def _sql_part_k_core() -> str:
    from etl_instagram_spark.operators.graph import (
        COPURCHASE_EDGES_SQL,
        k_core_sql,
    )

    # budget 24 >= 2x the measured sf0.01 peel depth of 10 (pinned by
    # tests/test_graph.py::test_k_core_peel_depth_within_half_the_oracle_budget
    # — the CC oracle's margin discipline); converged rounds are no-ops
    ctes = k_core_sql(COPURCHASE_EDGES_SQL.format(min_orders=2), k=3, rounds=24)
    return f"""
    WITH {ctes}
    SELECT id, count(*) AS core_degree
    FROM (SELECT lo AS id FROM core UNION ALL SELECT hi FROM core)
    GROUP BY id
    ORDER BY core_degree DESC, id
    LIMIT 50
    """


def _graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): deterministic DeepWalk-style random walks
    over the customer↔supplier graph — 4 steps from every node, next
    hop = hash32(seed, walk, step) mod outdeg over sorted neighbors, so
    the walk corpus is a pure function of (graph, seed). Per-step
    count / distinct-node / checksum profile replayed in DuckDB."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        random_walks,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    walks = random_walks(bipartite_order_edges(od, li), walk_len=4)
    return (
        walks.groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.countDistinct("node").alias("n_distinct_nodes"),
            F.sum("node").alias("node_checksum"),
        )
        .orderBy("step")
    )


def _sql_graph_random_walks() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_SQL,
        random_walks_sql,
    )

    ctes = random_walks_sql(BIPARTITE_ORDER_EDGES_SQL, walk_len=4)
    return f"""
    WITH {ctes}
    SELECT step, count(*) AS n_visits,
           count(DISTINCT node) AS n_distinct_nodes,
           (sum(node))::BIGINT AS node_checksum
    FROM walks GROUP BY step ORDER BY step
    """


def _graph_weighted_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r11): WEIGHTED deterministic walks — the interval
    pick follows edges ∝ order-line count (P(v→u) = w/W(v)) over the
    customer↔supplier graph, with the max_degree hub cap engaged so
    the cap + cumulative-weight machinery certify together. Per-step
    visit/distinct/checksum profile replayed in DuckDB."""
    from etl_instagram_spark.operators.graph import (
        bipartite_order_edges,
        random_walks,
    )

    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    walks = random_walks(
        bipartite_order_edges(od, li, weighted=True),
        walk_len=4,
        seed="ww",
        weight_col="w",
        max_degree=32,
    )
    return (
        walks.groupBy("step")
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.countDistinct("node").alias("n_distinct_nodes"),
            F.sum("node").alias("node_checksum"),
        )
        .orderBy("step")
    )


def _sql_graph_weighted_walks() -> str:
    from etl_instagram_spark.operators.graph import (
        BIPARTITE_ORDER_EDGES_WEIGHTED_SQL,
        random_walks_sql,
    )

    ctes = random_walks_sql(
        BIPARTITE_ORDER_EDGES_WEIGHTED_SQL,
        walk_len=4,
        seed="ww",
        weighted=True,
        max_degree=32,
    )
    return f"""
    WITH {ctes}
    SELECT step, count(*) AS n_visits,
           count(DISTINCT node) AS n_distinct_nodes,
           (sum(node))::BIGINT AS node_checksum
    FROM walks GROUP BY step ORDER BY step
    """


def _part_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): triangle counting / clustering coefficients
    over the part co-purchase projection (parts co-occurring on ≥ 3
    orders). Oriented-wedge algorithm — two key-equi joins, every
    triangle found once; the oracle replays projection, orientation,
    wedges, and closure in one statement."""
    from etl_instagram_spark.operators.graph import (
        copurchase_edges,
        triangle_counts,
    )

    li = _t(spark, sf_dir, "lineitem")
    stats = triangle_counts(copurchase_edges(li, min_orders=3))
    return stats.orderBy(F.col("n_triangles").desc(), "id").limit(50)


def _sql_part_triangle_stats() -> str:
    from etl_instagram_spark.operators.graph import (
        COPURCHASE_EDGES_SQL,
        triangle_counts_sql,
    )

    inner = triangle_counts_sql(COPURCHASE_EDGES_SQL.format(min_orders=3))
    return f"""
    SELECT * FROM ({inner})
    ORDER BY n_triangles DESC, id
    LIMIT 50
    """


def _events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): bounded-window exponential smoothing
    (operators/temporal.ewma_smooth) over each event-type series —
    per-type row count, an order-independent integer checksum of every
    smoothed value (Σ floor(ewma·10^6)), and the series' final ewma.
    The checksum certifies EVERY row's smoothed value without emitting
    6k rows; integer sums make it partition-order-proof."""
    from etl_instagram_spark.operators.temporal import ewma_smooth

    ev = _t(spark, sf_dir, "events")
    sm = ewma_smooth(ev, alpha=0.3, window=8)
    w = W.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        sm.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", F.col("ewma").alias("last_ewma"))
    )
    agg = sm.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("ewma") * 1e6).cast("long")).alias("ewma_checksum"),
    )
    return agg.join(last, "event_type").orderBy("event_type")


def _sql_events_ewma() -> str:
    from etl_instagram_spark.operators.temporal import ewma_sql_expr

    e = ewma_sql_expr(0.3, 8)
    return f"""
    WITH sm AS (
      SELECT event_type, ts, event_id, {e} AS ewma
      FROM (SELECT event_type, ts, event_id,
                   list(value::DOUBLE) OVER (
                     PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS arr
            FROM events WHERE value IS NOT NULL)),
    last AS (
      SELECT event_type, ewma AS last_ewma
      FROM (SELECT event_type, ewma,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM sm) WHERE rn = 1)
    SELECT sm.event_type, count(*) AS n_rows,
           (sum(CAST(floor(ewma * 1e6) AS BIGINT)))::BIGINT AS ewma_checksum,
           any_value(last_ewma) AS last_ewma
    FROM sm JOIN last ON sm.event_type = last.event_type
    GROUP BY sm.event_type
    ORDER BY sm.event_type
    """


def _events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): weekly cohort retention — cohort by first-
    event week, activity by any-event week, offsets 0..8."""
    from etl_instagram_spark.operators.funnel import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", max_offset=8)


def _events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Never-gated (r10): first-order Markov transition matrix over
    each user's event sequence under the (ts, event_id) total order —
    counts + row-normalized probabilities, replayed in SQL."""
    from etl_instagram_spark.operators.funnel import transition_matrix

    ev = _t(spark, sf_dir, "events")
    return transition_matrix(ev, "user_id", "ts", "event_type", "event_id")


_SQL_EVENTS_TRANSITIONS = """
    WITH pairs AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS from_state,
             event_type AS to_state
      FROM events),
    counts AS (
      SELECT from_state, to_state, count(*) AS n_transitions
      FROM pairs WHERE from_state IS NOT NULL
      GROUP BY from_state, to_state)
    SELECT from_state, to_state, n_transitions,
           round(n_transitions
                 / (sum(n_transitions) OVER (PARTITION BY from_state))::DOUBLE,
                 6) AS prob
    FROM counts
    ORDER BY from_state, to_state
    """


_SQL_COHORT_RETENTION = """
    WITH f AS (SELECT user_id AS u, date_trunc('week', min(ts)) AS cohort
               FROM events GROUP BY u),
    a AS (SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS wk
          FROM events),
    cs AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY cohort),
    j AS (SELECT f.cohort,
                 CAST((floor(epoch(a.wk)) - floor(epoch(f.cohort)))
                      / 604800 AS BIGINT) AS week_offset,
                 count(DISTINCT a.u) AS n_active
          FROM a JOIN f ON a.u = f.u
          WHERE floor(epoch(a.wk)) >= floor(epoch(f.cohort))
            AND floor(epoch(a.wk)) <= floor(epoch(f.cohort)) + 8 * 604800
          GROUP BY 1, 2)
    SELECT strftime(j.cohort, '%Y-%m-%d') AS cohort_week, week_offset,
           n_active, cohort_size,
           round(n_active * 100.0 / cohort_size, 4) AS retention_pct
    FROM j JOIN cs USING (cohort)
    ORDER BY cohort_week, week_offset
    """


def _register_rotated() -> None:
    from etl_instagram_spark.plans import llm_queries
    from etl_instagram_spark.plans.oracle import (
        SQL_CONDITIONAL_AGG_PROMO_SHARE,
        SQL_Q6_FORECAST_REVENUE,
    )

    EXTRAS["emb_knn_cosine"] = (_emb_knn_cosine, llm_queries.SQL_KNN_COSINE)
    EXTRAS["supplier_geo_bands"] = (
        _supplier_geo_bands,
        llm_queries.SQL_SUPPLIER_GEO_BANDS,
    )
    EXTRAS["q6_forecast_revenue"] = (_q6_forecast_revenue, SQL_Q6_FORECAST_REVENUE)
    EXTRAS["part_url_parse"] = (_part_url_parse, llm_queries.SQL_PART_URL_PARSE)
    EXTRAS["conditional_agg_promo_share"] = (
        _conditional_agg_promo_share,
        SQL_CONDITIONAL_AGG_PROMO_SHARE,
    )
    EXTRAS["docs_quality_bands"] = (
        _docs_quality_bands,
        llm_queries.SQL_DOCS_QUALITY_BANDS,
    )
    EXTRAS["docs_hybrid_rrf"] = (_docs_hybrid_rrf, _sql_hybrid_rrf())
    # never-gated (r14): inverted-index BM25 — pinned to the scan
    # path's own oracle (identical rows by the fixed-order fold)
    EXTRAS["docs_bm25_indexed"] = (
        _docs_bm25_indexed,
        _sql_docs_bm25_indexed(),
    )
    # stored as a CALLABLE: the mirror's model literals are FIT from the
    # gate data, and building them at import time would read parquet on
    # every `import etl_instagram_spark` (the plans.oracle lazy pattern)
    EXTRAS["docs_unigram_ppl"] = (_docs_unigram_ppl, _sql_unigram_ppl)
    EXTRAS["orders_profile"] = (_orders_profile, _sql_orders_profile())
    EXTRAS["orders_above_customer_avg"] = (
        _orders_above_customer_avg,
        _SQL_ABOVE_CUST_AVG,
    )
    EXTRAS["docs_bpe_pack"] = (_docs_bpe_pack, _sql_bpe_pack)
    EXTRAS["docs_bigram_ppl"] = (_docs_bigram_ppl, _sql_bigram_ppl)
    EXTRAS["customer_rank_distributions"] = (
        _customer_rank_distributions,
        _SQL_CUST_RANK_DIST,
    )
    EXTRAS["events_gapfill"] = (_events_gapfill, _SQL_EVENTS_GAPFILL)
    EXTRAS["events_anomalies"] = (_events_anomalies, _SQL_EVENTS_ANOMALIES)
    from etl_instagram_spark.plans.oracle import SQL_ORDER_GAP_DAYS

    EXTRAS["order_gap_days"] = (_order_gap_days, SQL_ORDER_GAP_DAYS)
    EXTRAS["docs_span_dedup"] = (_docs_span_dedup, _SQL_SPAN_DEDUP)
    # callable: model literals fit from gate data (see docs_unigram_ppl)
    EXTRAS["docs_perplexity_buckets"] = (
        _docs_perplexity_buckets,
        _sql_perplexity_buckets,
    )
    # r9 rotation (for emb_ann_ivf_stored): the IVF recall formulation —
    # oracle callable because its centroid literals are fit from data
    EXTRAS["emb_ann_ivf_recall"] = (
        llm_queries.emb_ann_ivf_recall,
        llm_queries._ivf_oracle_sql,
    )
    EXTRAS["docs_gopher_ngram_flags"] = (
        _docs_gopher_ngram_flags,
        _sql_gopher_ngram_flags(),
    )
    # callable: model literals fit from gate data (see docs_unigram_ppl)
    EXTRAS["docs_dsir_selection"] = (_docs_dsir_selection, _sql_dsir_selection)
    # r10 rotations (for graph_pagerank_suppliers, docs_dup_cluster_reps,
    # docs_leakage_safe_split)
    from etl_instagram_spark.plans.oracle import SQL_TOP3_ORDERS_PER_CUSTOMER

    EXTRAS["top3_orders_per_customer"] = (
        _top3_orders_per_customer,
        SQL_TOP3_ORDERS_PER_CUSTOMER,
    )
    EXTRAS["nation_customer_listagg"] = (
        _nation_customer_listagg,
        llm_queries.SQL_NATION_CUSTOMER_LISTAGG,
    )
    EXTRAS["part_metrics_unpivot"] = (
        _part_metrics_unpivot,
        llm_queries.SQL_PART_METRICS_UNPIVOT,
    )
    # never-gated (r10): personalized PageRank — seeded teleport variant
    # of the gate's graph_pagerank_suppliers
    EXTRAS["graph_ppr_building_suppliers"] = (
        _graph_ppr_building_suppliers,
        _sql_ppr_building_suppliers(),
    )
    # never-gated (r10): cross-engine-exact HyperLogLog registers
    EXTRAS["events_hll_distinct"] = (
        _events_hll_distinct,
        _sql_events_hll_distinct(),
    )
    # never-gated (r10): weighted PageRank — interaction-intensity walk
    EXTRAS["graph_pagerank_weighted"] = (
        _graph_pagerank_weighted,
        _sql_pagerank_weighted(),
    )
    # never-gated (r11): redistribute-dangling PageRank (standard
    # formulation; the directed graph makes every supplier a sink)
    EXTRAS["graph_pagerank_dangling"] = (
        _graph_pagerank_dangling,
        _sql_graph_pagerank_dangling(),
    )
    # r11 rotation: quartile bucketing (seat given to part_entity_resolution)
    EXTRAS["customer_revenue_quartiles"] = (
        _customer_revenue_quartiles,
        llm_queries.SQL_CUSTOMER_REVENUE_QUARTILES,
    )
    # r13 rotation: SimHash per-row expression (seat given to
    # events_cm_frequency — the driver gate now certifies the sketch
    # family directly; the near-dup family stays gated via
    # docs_near_dedup_summary and emb_near_dedup, plus
    # docs_ngram_jaccard until its own r14 rotation)
    EXTRAS["docs_simhash"] = (
        llm_queries.docs_simhash,
        llm_queries.SQL_DOCS_SIMHASH,
    )
    # r13 rotation: multi-probe LSH recall (seat given to
    # events_funnel_levels — the driver gate now certifies the
    # behavioral family directly; the ANN family stays gated via
    # emb_ann_ivf_stored / emb_pq_recall / emb_knn_join_recall)
    EXTRAS["emb_ann_recall"] = (
        llm_queries.emb_ann_recall,
        llm_queries.SQL_EMB_ANN_RECALL,
    )
    # r14 rotation: prefix-filtered exact n-gram Jaccard join (seat
    # given to events_dcm_quantiles — the driver gate now certifies the
    # quantile face of the sketch family directly; the near-dup family
    # stays gated via docs_near_dedup_summary and emb_near_dedup)
    EXTRAS["docs_ngram_jaccard"] = (
        llm_queries.docs_ngram_jaccard,
        llm_queries.SQL_DOCS_NGRAM_JACCARD,
    )
    # never-gated (r13): WEIGHTED dcm quantiles (token-mass-weighted
    # doc-length percentiles on the shared token kernel)
    EXTRAS["docs_token_weighted_length_quantiles"] = (
        _docs_token_weighted_length_quantiles,
        _sql_docs_token_weighted_length_quantiles(),
    )
    # never-gated (r13): WEIGHTED heavy hitters (token-mass domain
    # concentration at a live integer threshold boundary)
    EXTRAS["docs_token_weighted_domain_hitters"] = (
        _docs_token_weighted_domain_hitters,
        _sql_docs_token_weighted_domain_hitters(),
    )
    # never-gated (r11): systematic PPS weighted sampling
    EXTRAS["docs_pps_sample"] = (_docs_pps_sample, _sql_docs_pps_sample())
    # never-gated (r11): k-core graph denoising
    EXTRAS["part_k_core"] = (_part_k_core, _sql_part_k_core())
    # never-gated (r11): sorted-neighborhood entity resolution
    EXTRAS["part_entity_snm"] = (
        _part_entity_snm,
        _sql_part_entity_snm(),
    )
    # never-gated (r10): deterministic random-walk corpus profile
    EXTRAS["graph_random_walks"] = (
        _graph_random_walks,
        _sql_graph_random_walks(),
    )
    # never-gated (r11): weighted walks with the hub cap engaged
    EXTRAS["graph_weighted_walks"] = (
        _graph_weighted_walks,
        _sql_graph_weighted_walks(),
    )
    # never-gated (r10): triangles over the co-purchase projection
    EXTRAS["part_triangle_stats"] = (
        _part_triangle_stats,
        _sql_part_triangle_stats(),
    )
    # never-gated (r10): bounded-window exponential smoothing
    EXTRAS["events_ewma"] = (_events_ewma, _sql_events_ewma())
    # never-gated (r10): behavioral analytics — funnel + cohort retention
    EXTRAS["events_cohort_retention"] = (
        _events_cohort_retention,
        _SQL_COHORT_RETENTION,
    )
    EXTRAS["events_transitions"] = (_events_transitions, _SQL_EVENTS_TRANSITIONS)


_register_rotated()
