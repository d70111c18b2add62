"""Walk co-occurrence → PPMI → random-projection node embeddings
(operators/graph_embed.py): hand-computed window semantics, pinned
float discipline against a pure-Python reference, bit-for-bit DuckDB
replay of the whole chain, partitioning invariance, the overflow
guard, the zero-norm branch, and the composition into the similarity
operators the embeddings exist to feed."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.operators.graph_embed import (
    PPMI_QUANT,
    ppmi_scores,
    ppmi_sql,
    walk_cooccurrence,
    walk_cooccurrence_sql,
    walk_embeddings,
    walk_embeddings_sql,
)

EDGES = [
    (1, 2), (2, 1), (2, 3), (3, 1), (3, 4),
    (4, 5), (5, 3), (1, 4), (6, 1), (4, 1),
]


def _walks_df(spark, rows):
    return spark.createDataFrame(rows, "walk_id long, step int, node long")


# ---------------------------------------------------------------------------
# co-occurrence window semantics
# ---------------------------------------------------------------------------


def test_cooccurrence_hand_computed_window(spark):
    """One walk a→b→c→d at window=2: every ordered position pair with
    0 < |i−j| ≤ 2, including both directions."""
    rows = [(7, 0, 10), (7, 1, 20), (7, 2, 30), (7, 3, 40)]
    got = {
        (r["src"], r["ctx"]): r["cnt"]
        for r in walk_cooccurrence(_walks_df(spark, rows), window=2).collect()
    }
    expected_pairs = {}
    seq = [10, 20, 30, 40]
    for i in range(4):
        for j in range(4):
            if i != j and abs(i - j) <= 2:
                key = (seq[i], seq[j])
                expected_pairs[key] = expected_pairs.get(key, 0) + 1
    assert got == expected_pairs


def test_cooccurrence_revisit_counts_positionally(spark):
    """A walk that revisits a node co-occurs with itself — positional
    skip-gram semantics, and counts accumulate across walks."""
    rows = [
        (1, 0, 5), (1, 1, 9), (1, 2, 5),   # 5 → 9 → 5
        (2, 0, 5), (2, 1, 9),              # second walk reinforces (5,9)
    ]
    got = {
        (r["src"], r["ctx"]): r["cnt"]
        for r in walk_cooccurrence(_walks_df(spark, rows), window=1).collect()
    }
    assert got == {(5, 9): 3, (9, 5): 3}
    got2 = {
        (r["src"], r["ctx"]): r["cnt"]
        for r in walk_cooccurrence(_walks_df(spark, rows), window=2).collect()
    }
    # window=2 adds the positional self-pair (5,5) in both directions
    assert got2 == {(5, 9): 3, (9, 5): 3, (5, 5): 2}


def test_cooccurrence_rejects_bad_window(spark):
    with pytest.raises(ValueError, match="window"):
        walk_cooccurrence(_walks_df(spark, [(1, 0, 1)]), window=0)


def test_short_dangling_walks_contribute_fewer_pairs(spark):
    """A 1-row walk (start node with no out-edges) emits no pairs."""
    rows = [(3, 0, 99), (4, 0, 1), (4, 1, 2)]
    got = walk_cooccurrence(_walks_df(spark, rows), window=2).collect()
    assert {(r["src"], r["ctx"]): r["cnt"] for r in got} == {
        (1, 2): 1,
        (2, 1): 1,
    }


# ---------------------------------------------------------------------------
# PPMI pinned-float discipline
# ---------------------------------------------------------------------------


def _py_ppmi(cnt, total, src_cnt, ctx_cnt):
    """The EXACT pinned operation chain of ppmi_scores, in Python
    (glibc log — the 1-ulp JVM divergence is absorbed by the 1e-6
    quantization downstream; here the inputs are chosen exact)."""
    return max(
        math.log((float(cnt) * float(total)) / (float(src_cnt) * float(ctx_cnt))),
        0.0,
    )


def test_ppmi_matches_reference_and_clamps(spark):
    cooc = spark.createDataFrame(
        [(1, 2, 6), (2, 1, 6), (1, 3, 1), (3, 1, 1)],
        "src long, ctx long, cnt long",
    )
    rows = {(r["src"], r["ctx"]): r for r in ppmi_scores(cooc).collect()}
    total = 14
    marg = {1: 7, 2: 6, 3: 1}
    for (s, c), r in rows.items():
        expect = _py_ppmi(r["cnt"], total, marg[s], marg[c])
        assert r["ppmi"] == pytest.approx(expect, abs=1e-12), (s, c)
    # an explicitly negative-PMI pair clamps to exactly 0.0: (1,2) is
    # rare while both nodes are otherwise frequent —
    # PMI(1,2) = ln(1·38/(10·10)) = ln 0.38 < 0
    cooc2 = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1), (1, 3, 9), (3, 1, 9), (2, 3, 9), (3, 2, 9)],
        "src long, ctx long, cnt long",
    )
    vals = {
        (r["src"], r["ctx"]): r["ppmi"] for r in ppmi_scores(cooc2).collect()
    }
    assert vals[(1, 2)] == 0.0
    assert vals[(2, 1)] == 0.0
    # no negative ppmi anywhere
    assert all(v >= 0.0 for v in vals.values())


# ---------------------------------------------------------------------------
# embeddings: exactness, invariance, guards, zero-norm
# ---------------------------------------------------------------------------


def _ppmi_df(spark, rows):
    return spark.createDataFrame(rows, "src long, ctx long, ppmi double")


def test_identical_context_profiles_embed_identically(spark):
    """Two nodes with the same (ctx, ppmi) rows get the SAME embedding
    — the property cosine-near-dup over these vectors relies on."""
    rows = [
        (1, 100, 2.5), (1, 200, 0.7), (1, 300, 1.1),
        (2, 100, 2.5), (2, 200, 0.7), (2, 300, 1.1),
        (3, 400, 3.0), (3, 100, 0.2),
    ]
    emb = {
        r["node"]: (r["emb"], r["norm"])
        for r in walk_embeddings(_ppmi_df(spark, rows), dim=8).collect()
    }
    assert emb[1][0] == emb[2][0]
    assert emb[1][1] == emb[2][1]
    assert emb[1][0] != emb[3][0]
    # unit-normalized whenever norm > 0
    for v, n in emb.values():
        assert n > 0
        assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-12)


def test_embeddings_partitioning_invariant(spark):
    rows = [
        (i % 17, (i * 31) % 23 + 1000, 0.1 + (i % 7) * 0.37)
        for i in range(200)
    ]
    base = _ppmi_df(spark, rows)
    a = walk_embeddings(base.repartition(1), dim=8, seed="pi")
    b = walk_embeddings(base.repartition(13, "ctx"), dim=8, seed="pi")
    ra = sorted((tuple(r) for r in a.collect()), key=repr)
    rb = sorted((tuple(r) for r in b.collect()), key=repr)
    assert ra == rb


def test_zero_ppmi_rows_do_not_create_nodes(spark):
    """A node whose every context clamped to 0 gets NO embedding row."""
    rows = [(1, 10, 0.0), (2, 10, 1.0)]
    nodes = {
        r["node"] for r in walk_embeddings(_ppmi_df(spark, rows), dim=4).collect()
    }
    assert nodes == {2}


def test_zero_norm_branch_keeps_raw_zeros(spark):
    """ppmi small enough that q = round(ppmi·quant) = 0 for every
    context: the projection sums are all 0, norm = 0, and the raw zero
    vector is kept instead of dividing by zero."""
    rows = [(1, 10, 4e-7), (1, 11, 4e-7)]
    got = walk_embeddings(_ppmi_df(spark, rows), dim=4).collect()
    assert len(got) == 1
    assert got[0]["norm"] == 0.0
    assert got[0]["emb"] == [0.0, 0.0, 0.0, 0.0]
    assert not any(math.isnan(x) for x in got[0]["emb"])


def test_overflow_guard_trips_loudly(spark):
    rows = [(1, 10 + i, 10.0) for i in range(4)]
    with pytest.raises(ValueError, match="overflow"):
        walk_embeddings(_ppmi_df(spark, rows), dim=2, quant=10**18)


def test_rejects_bad_dim_and_quant(spark):
    df = _ppmi_df(spark, [(1, 2, 1.0)])
    with pytest.raises(ValueError, match="dim"):
        walk_embeddings(df, dim=0)
    with pytest.raises(ValueError, match="quant"):
        walk_embeddings(df, dim=2, quant=0)
    with pytest.raises(ValueError, match="dim"):
        walk_embeddings_sql(dim=0)


# ---------------------------------------------------------------------------
# cross-engine replay of the whole chain
# ---------------------------------------------------------------------------


def test_full_chain_bit_identical_to_duckdb(spark):
    """walks → cooc → ppmi → embeddings, Spark vs the SQL mirrors on
    the same tiny graph: node sets, counts, AND every float bit-equal
    (the comparator discipline of tests/test_rotated_parity.py)."""
    from etl_instagram_spark.operators.graph import (
        random_walks,
        random_walks_sql,
    )

    e = spark.createDataFrame(EDGES, "src long, dst long")
    walks = random_walks(e, walk_len=4, seed="gw")
    emb = walk_embeddings(
        ppmi_scores(walk_cooccurrence(walks, window=2)), dim=8, seed="emb"
    )
    srows = sorted(
        (tuple(r) for r in emb.select("node", "emb", "norm").collect()),
        key=repr,
    )

    edges_sql = (
        "SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in EDGES)
        + ") t(src, dst)"
    )
    sql = (
        "WITH "
        + random_walks_sql(edges_sql, walk_len=4, seed="gw")
        + ", "
        + walk_cooccurrence_sql(window=2)
        + ", "
        + ppmi_sql()
        + ", "
        + walk_embeddings_sql(dim=8, seed="emb")
        + " SELECT node, emb, norm FROM embs"
    )
    drows = sorted((tuple(r) for r in duckdb.sql(sql).fetchall()), key=repr)
    assert len(srows) > 0
    assert srows == drows
    assert all(
        tuple(type(x) for x in a) == tuple(type(x) for x in b)
        for a, b in zip(srows, drows)
    )


def test_cooc_and_ppmi_bit_identical_to_duckdb(spark):
    """The intermediate frames replay too (ppmi rounded to 6 like the
    BM25 scores — the ln is the one libm boundary)."""
    from etl_instagram_spark.operators.graph import (
        random_walks,
        random_walks_sql,
    )

    e = spark.createDataFrame(EDGES, "src long, dst long")
    walks = random_walks(e, walk_len=3, seed="cp")
    pp = ppmi_scores(walk_cooccurrence(walks, window=2)).select(
        "src", "ctx", "cnt", F.round("ppmi", 6).alias("ppmi6")
    )
    srows = sorted((tuple(r) for r in pp.collect()), key=repr)
    edges_sql = (
        "SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in EDGES)
        + ") t(src, dst)"
    )
    sql = (
        "WITH "
        + random_walks_sql(edges_sql, walk_len=3, seed="cp")
        + ", "
        + walk_cooccurrence_sql(window=2)
        + ", "
        + ppmi_sql()
        + " SELECT src, ctx, cnt, round(ppmi, 6) AS ppmi6 FROM ppmi"
    )
    drows = sorted((tuple(r) for r in duckdb.sql(sql).fetchall()), key=repr)
    assert srows == drows


# ---------------------------------------------------------------------------
# composition: the embeddings feed the similarity operators
# ---------------------------------------------------------------------------


def test_embeddings_compose_with_cosine_similarity(spark):
    """Structural near-dup end-to-end: two nodes wired to the same
    contexts land at cosine ~1 under operators/similarity.cosine while
    a differently-wired node does not."""
    from etl_instagram_spark.operators.similarity import cosine

    # twin nodes 1 and 2 share every context; 3 is wired elsewhere
    rows = (
        [(1, c, w) for c, w in [(100, 2.0), (101, 1.5), (102, 0.4)]]
        + [(2, c, w) for c, w in [(100, 2.0), (101, 1.5), (102, 0.4)]]
        + [(3, c, w) for c, w in [(200, 2.0), (201, 1.5), (102, 0.1)]]
    )
    emb = walk_embeddings(_ppmi_df(spark, rows), dim=16, seed="cmp")
    a = emb.select(F.col("node").alias("na"), F.col("emb").alias("ea"))
    b = emb.select(F.col("node").alias("nb"), F.col("emb").alias("eb"))
    sims = {
        (r["na"], r["nb"]): r["sim"]
        for r in a.join(b, F.col("na") < F.col("nb"))
        .select("na", "nb", cosine(F.col("ea"), F.col("eb")).alias("sim"))
        .collect()
    }
    assert sims[(1, 2)] == pytest.approx(1.0, abs=1e-12)
    assert sims[(1, 3)] < 0.9


# ---------------------------------------------------------------------------
# property tests (hypothesis): structural identities on arbitrary corpora
# ---------------------------------------------------------------------------


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_walk_corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # walk_id
        st.integers(min_value=0, max_value=30),  # node
    ),
    min_size=1,
    max_size=60,
)


def _to_walk_rows(raw):
    """Assign contiguous steps per walk_id in list order — every corpus
    hypothesis generates is a VALID walk frame by construction."""
    counters: dict[int, int] = {}
    rows = []
    for wid, node in raw:
        step = counters.get(wid, 0)
        counters[wid] = step + 1
        rows.append((wid, step, node))
    return rows


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_walk_corpus, window=st.integers(min_value=1, max_value=3))
def test_cooccurrence_symmetric_and_mass_conserving(spark, raw, window):
    """Two invariants that hold for EVERY walk corpus: (a) the pair set
    is positionally symmetric — cnt(a,b) == cnt(b,a) always; (b) total
    pair mass equals Σ_walks Σ_i |{j : 0 < |i−j| ≤ window}| computed
    from walk lengths alone."""
    rows = _to_walk_rows(raw)
    got = {
        (r["src"], r["ctx"]): r["cnt"]
        for r in walk_cooccurrence(
            _walks_df(spark, rows), window=window
        ).collect()
    }
    for (a, b), c in got.items():
        assert got.get((b, a)) == c, (a, b)
    lengths: dict[int, int] = {}
    for wid, _, _ in rows:
        lengths[wid] = lengths.get(wid, 0) + 1
    expect_mass = sum(
        sum(
            min(i + window, ln - 1) - max(i - window, 0)
            for i in range(ln)
        )
        for ln in lengths.values()
    )
    assert sum(got.values()) == expect_mass


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=_walk_corpus)
def test_ppmi_marginal_identity(spark, raw):
    """For every corpus, each emitted ppmi reconstructs from the cnt
    column and the frame's OWN marginals via the pinned operation chain
    — catches any marginal-join mis-key (a ppmi computed against the
    wrong src_cnt/ctx_cnt row would diverge on skewed corpora)."""
    import math as m

    rows = _to_walk_rows(raw)
    cooc = walk_cooccurrence(_walks_df(spark, rows), window=2)
    pairs = {
        (r["src"], r["ctx"]): r["cnt"] for r in cooc.collect()
    }
    if not pairs:
        return
    total = sum(pairs.values())
    srcm: dict[int, int] = {}
    ctxm: dict[int, int] = {}
    for (a, b), c in pairs.items():
        srcm[a] = srcm.get(a, 0) + c
        ctxm[b] = ctxm.get(b, 0) + c
    got = {
        (r["src"], r["ctx"]): r["ppmi"]
        for r in ppmi_scores(cooc).collect()
    }
    for (a, b), c in pairs.items():
        expect = max(
            m.log((float(c) * float(total)) / (float(srcm[a]) * float(ctxm[b]))),
            0.0,
        )
        assert got[(a, b)] == pytest.approx(expect, abs=1e-12), (a, b)


def test_embeddings_compose_with_knn_self_join(spark):
    """The chain's output is directly consumable by the ANN operators:
    walk embeddings from the real graph feed knn_self_join, and a pair
    of identically-wired twin nodes find each other at cos_sim ~1 as
    mutual rank-1 neighbors."""
    from etl_instagram_spark.operators.similarity import knn_self_join

    # two twins (1,2) + structured others
    rows = (
        [(1, c, w) for c, w in [(100, 2.0), (101, 1.5), (102, 0.4)]]
        + [(2, c, w) for c, w in [(100, 2.0), (101, 1.5), (102, 0.4)]]
        + [(n, (n * 13) % 7 + 200, 0.3 + (n % 5) * 0.5) for n in range(3, 40)]
    )
    emb = walk_embeddings(_ppmi_df(spark, rows), dim=16, seed="knn")
    knn = knn_self_join(
        emb.select(F.col("node").alias("vec_id"), F.col("emb").alias("embedding")),
        k=3,
        bits=2,
    )
    top = {
        r["vec_id"]: (r["neighbor_id"], r["cos_sim"])
        for r in knn.filter(F.col("knn_rank") == 1).collect()
    }
    assert top[1][0] == 2 and top[2][0] == 1
    assert top[1][1] == pytest.approx(1.0, abs=1e-9)
