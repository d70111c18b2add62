"""BM25 ranked retrieval: differential against the scalar reference,
ranking sanity on a crafted corpus, parameter validation, degenerate
corpora, and the no-wide-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.operators.retrieval import (
    bm25_corpus_stats,
    bm25_score_py,
    bm25_topk,
)

DOCS = [
    (1, "spark runs spark jobs on spark clusters"),       # tf(spark)=3, 7 words
    (2, "spark joins tables"),                             # tf=1, short
    (3, "rare gem hidden here"),                           # tf(gem)=1
    (4, "tables joined by the planner with no match"),     # no query terms
    (5, "spark spark"),                                    # tf=2, 2 words
    (6, ""),                                               # blank
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_scalar_reference(spark, docs):
    """Every returned score equals the independent scalar formula run on
    hand-derived (tf, df, dl) — including the rare-term idf boost."""
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            docs, "doc_id", "text", ["spark", "gem"], k=10
        ).collect()
    }
    n_docs, avgdl = 6, (7 + 3 + 4 + 8 + 2 + 0) / 6
    tf = {1: (3, 7), 2: (1, 3), 3: (0, 4), 5: (2, 2)}
    want = {}
    for doc, (tf_spark, dl) in tf.items():
        s = bm25_score_py(tf_spark, 3, n_docs, dl, avgdl, 1.2, 0.75)
        if doc == 3:
            s += bm25_score_py(1, 1, n_docs, dl, avgdl, 1.2, 0.75)
        want[doc] = round(s, 6)
    assert out == pytest.approx(want)
    # doc 4 (no terms) and doc 6 (blank) must not appear at all
    assert 4 not in out and 6 not in out
    # the rare term's idf dominates the common term's repetitions
    assert out[3] == max(out.values())


def test_bm25_corpus_stats_row(spark, docs):
    row = bm25_corpus_stats(docs, "text", ["spark", "gem"]).first()
    assert row["n_docs"] == 6
    assert row["avgdl"] == pytest.approx(24 / 6)
    assert row["df_0"] == 3 and row["df_1"] == 1


def test_bm25_k_and_tie_break(spark, docs):
    """k truncates after the (score desc, id asc) ordering."""
    top = bm25_topk(docs, "doc_id", "text", ["spark"], k=2).collect()
    assert len(top) == 2
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_bm25_empty_and_all_miss_corpora(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_topk(empty, "doc_id", "text", ["spark"]).count() == 0
    miss = spark.createDataFrame([(1, "nothing relevant")], "doc_id long, text string")
    assert bm25_topk(miss, "doc_id", "text", ["spark"]).count() == 0


def test_bm25_validation(spark, docs):
    for bad in ([], ["ok", ""], ["dup", "dup"]):
        with pytest.raises(ValueError):
            bm25_topk(docs, "doc_id", "text", bad)
    with pytest.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", ["x"], k1=-1)
    with pytest.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", ["x"], b=1.5)
    with pytest.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", ["x"], k=0)


def test_bm25_plan_broadcasts_stats_no_wide_shuffle(spark):
    """The corpus is never shuffled: the only Exchanges allowed are the
    stats row's global aggregation (partial → single) and the top-k's
    TakeOrdered machinery; the stats join must be a broadcast."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        bm25_topk(docs, "doc_id", "text", ["spark", "vector"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # no shuffle keyed on document data: every Exchange is either the
    # 1-row stats aggregation (SinglePartition) or absent
    import re

    doc_exchanges = [
        ln
        for ln in plan.splitlines()
        if re.search(r"Exchange (hash|range)partitioning", ln)
    ]
    assert not doc_exchanges, doc_exchanges


# ---------------------------------------------------------------------------
# reciprocal-rank fusion (hybrid lexical + vector retrieval)
# ---------------------------------------------------------------------------


def test_rrf_fuse_matches_hand_computed(spark):
    from etl_instagram_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0)], "doc_id long, s double"
    )
    vec = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (1, 0.7)], "doc_id long, s double"
    )
    out = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse(
            [lex, vec],
            "doc_id",
            [[F.col("s").desc(), F.col("doc_id")], [F.col("s").desc(), F.col("doc_id")]],
            k=10,
        ).collect()
    }
    want = {
        1: round(1 / 61 + 1 / 63, 6),  # rank 1 lexical, rank 3 vector
        2: round(1 / 62, 6),
        3: round(1 / 63 + 1 / 61, 6),
        4: round(1 / 62, 6),
    }
    assert out == pytest.approx(want)


def test_rrf_hybrid_bm25_plus_cosine_end_to_end(spark, docs):
    """Fusing a BM25 list with a synthetic 'vector' list prefers docs
    present in both — the hybrid-retrieval composition."""
    from etl_instagram_spark.operators.retrieval import rrf_fuse

    lex = bm25_topk(docs, "doc_id", "text", ["spark"], k=5)
    vec = spark.createDataFrame(
        [(3, 0.99), (1, 0.55)], "doc_id long, cos double"
    )
    fused = rrf_fuse(
        [lex, vec],
        "doc_id",
        [
            [F.col("score").desc(), F.col("doc_id")],
            [F.col("cos").desc(), F.col("doc_id")],
        ],
        k=3,
    ).collect()
    assert fused[0]["doc_id"] == 1  # high in both lists → top fused


def test_rrf_validation(spark, docs):
    from etl_instagram_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([], "doc_id", [])
    with pytest.raises(ValueError):
        rrf_fuse([docs], "doc_id", [[F.col("doc_id")]], k=0)
    with pytest.raises(ValueError):
        rrf_fuse([docs, docs], "doc_id", [[F.col("doc_id")]])


def test_bm25_survives_adversarial_input_column_names(spark):
    """An input table already carrying n_docs / score / tf_0 columns
    must neither collide with the broadcast stats row nor leak into the
    output — all working columns are __bm-prefixed."""
    df = spark.createDataFrame(
        [(1, "spark spark jobs", 99, 1.5, 7.0), (2, "no match here", 99, 1.5, 7.0)],
        "doc_id long, text string, n_docs long, score double, tf_0 double",
    )
    out = bm25_topk(df, "doc_id", "text", ["spark"], k=5)
    assert out.columns == ["doc_id", "score", "tf_0"]
    row = out.first()
    assert row["doc_id"] == 1 and row["tf_0"] == 2.0 and row["score"] > 0


def test_bm25_indexed_equals_scan_path(spark, docs):
    """The inverted-index face answers EXACTLY what the scan face
    answers — ids, 6-dp scores, and per-term tf columns — on the
    blank-containing fixture corpus AND on real documents, across
    several query shapes (rare terms, all-miss term included, k
    variation). The fixed-order score fold is what makes this an
    equality, not an approximation."""
    from etl_instagram_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_index,
    )

    corpora = [
        (docs, "doc_id"),
        (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
            "doc_id",
        ),
    ]
    queries = [
        (["spark", "join"], 5),
        (["spark", "zzz_missing", "window"], 10),
        (["merge"], 3),
    ]
    for corpus_df, id_col in corpora:
        postings, corpus = build_bm25_index(corpus_df, id_col, "text")
        postings = postings.localCheckpoint(eager=True)
        for terms, k in queries:
            scan = [
                tuple(r)
                for r in bm25_topk(
                    corpus_df, id_col, "text", terms, k=k
                ).collect()
            ]
            idx = [
                tuple(r)
                for r in bm25_topk_indexed(
                    postings, corpus, id_col, terms, k=k
                ).collect()
            ]
            assert idx == scan, (terms, k)


def test_bm25_indexed_prunes_postings_scan(spark, tmp_path):
    """The query-time design claim: the term filter reaches the
    postings parquet scan as a pushed filter (with term-partitioned
    storage this is partition pruning) — the corpus itself is never
    scanned at query time."""
    from etl_instagram_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    postings, corpus = build_bm25_index(src, "doc_id", "text")
    path = str(tmp_path / "postings")
    postings.write.parquet(path)
    stored = spark.read.parquet(path)
    out = bm25_topk_indexed(stored, corpus, "doc_id", ["spark", "join"], k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "In(term" in plan or "term IN" in plan, plan[:2000]
    assert out.count() > 0


def test_bm25_indexed_degenerates_and_validation(spark):
    from etl_instagram_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    postings, corpus = build_bm25_index(empty, "doc_id", "text")
    assert bm25_topk_indexed(postings, corpus, "doc_id", ["x"]).count() == 0
    # blank-only corpus: n_docs counted, avgdl 0, no postings
    blanks = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id long, text string")
    p2, c2 = build_bm25_index(blanks, "doc_id", "text")
    assert p2.count() == 0
    row = c2.collect()[0]
    assert (row["n_docs"], row["avgdl"]) == (2, 0.0)
    with pytest.raises(ValueError, match="distinct"):
        bm25_topk_indexed(p2, c2, "doc_id", ["a", "a"])
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk_indexed(p2, c2, "doc_id", ["a"], k=0)
