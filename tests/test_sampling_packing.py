"""hash_split / stratified_sample / pack_* tests: determinism across
partitionings, leak-freedom under table growth, DuckDB mirror parity,
packing invariants (budget respected, every doc placed exactly once),
and the FFD-vs-cumsum quality relationship."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.operators.packing import (
    bin_fill_stats,
    pack_cumsum,
    pack_first_fit,
)
from etl_instagram_spark.operators.sampling import (
    bucket_sql,
    hash_split,
    sample_sql_predicate,
    split_sql_case,
    stratified_sample,
)

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture()
def ids(spark):
    return spark.range(2000).select(F.col("id").alias("doc_id"))


# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------


def test_split_is_total_and_roughly_proportional(spark, ids):
    counts = {
        r["split"]: r["n"]
        for r in hash_split(ids, "doc_id", WEIGHTS).groupBy("split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert sum(counts.values()) == 2000  # total: no row dropped
    assert counts["train"] == pytest.approx(1600, rel=0.08)
    assert counts["val"] == pytest.approx(200, rel=0.35)
    assert counts["test"] == pytest.approx(200, rel=0.35)


def test_split_deterministic_across_partitionings(spark, ids):
    a = {
        (r["doc_id"], r["split"])
        for r in hash_split(ids, "doc_id", WEIGHTS).collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in hash_split(ids.repartition(17), "doc_id", WEIGHTS).collect()
    }
    assert a == b


def test_split_stable_under_growth(spark, ids):
    """A doc's split must not change when the table grows — the no-leak
    property hash assignment buys over rand(seed)."""
    small = dict(
        (r["doc_id"], r["split"])
        for r in hash_split(ids.filter("doc_id < 500"), "doc_id", WEIGHTS).collect()
    )
    big = dict(
        (r["doc_id"], r["split"])
        for r in hash_split(ids, "doc_id", WEIGHTS).collect()
    )
    assert all(big[k] == v for k, v in small.items())


def test_split_matches_duckdb_mirror(spark, ids):
    got = sorted(
        (r["doc_id"], r["split"])
        for r in hash_split(ids, "doc_id", WEIGHTS).collect()
    )
    sql = split_sql_case("doc_id", WEIGHTS)
    want = sorted(
        duckdb.sql(
            f"SELECT doc_id, {sql} AS split FROM range(2000) t(doc_id)"
        ).fetchall()
    )
    assert got == want


def test_split_rejects_bad_weights(spark, ids):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ids, "doc_id", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match=">= 0"):
        hash_split(ids, "doc_id", {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(ids, "doc_id", {})


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


@pytest.fixture()
def labeled(spark):
    return spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("es").alias("lang"),
    )


def test_uniform_sample_fraction_and_mirror(spark, labeled):
    kept = stratified_sample(labeled, "doc_id", 0.2)
    ids_kept = sorted(r["doc_id"] for r in kept.collect())
    assert len(ids_kept) == pytest.approx(600, rel=0.1)
    pred = sample_sql_predicate("doc_id", 0.2)
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM range(3000) t(doc_id) WHERE {pred}"
        ).fetchall()
    )
    assert ids_kept == want


def test_nested_subsets_same_salt(spark, labeled):
    small = {r["doc_id"] for r in stratified_sample(labeled, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in stratified_sample(labeled, "doc_id", 0.3).collect()}
    assert small <= big  # same salt: smaller fraction nests in larger


def test_per_stratum_fractions(spark, labeled):
    kept = stratified_sample(
        labeled, "doc_id", {"en": 0.5, "es": 0.1}, strata_col="lang"
    )
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["en"] == pytest.approx(500, rel=0.15)
    assert counts["es"] == pytest.approx(200, rel=0.2)


def test_unlisted_stratum_dropped_and_validation(spark, labeled):
    kept = stratified_sample(labeled, "doc_id", {"en": 0.5}, strata_col="lang")
    assert kept.filter(F.col("lang") == "es").count() == 0
    with pytest.raises(ValueError, match="strata_col"):
        stratified_sample(labeled, "doc_id", {"en": 0.5})
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        stratified_sample(labeled, "doc_id", 1.2)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


@pytest.fixture()
def docs_tokens(spark):
    # sizes from tiny to near-budget so first-fit has real work to do
    rows = [(i, 50 + (i * 137) % 900) for i in range(400)] + [(1000, 5000)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


BUDGET = 1024


def test_first_fit_respects_budget(spark, docs_tokens):
    packed = pack_first_fit(docs_tokens, "doc_id", "n_tokens", BUDGET, shards=4)
    fills = bin_fill_stats(packed, "n_tokens", BUDGET).collect()
    over = [r for r in fills if r["bin_tokens"] > BUDGET]
    # only the oversize singleton may exceed the budget
    assert len(over) == 1 and over[0]["n_docs"] == 1
    assert packed.filter("oversize").count() == 1
    assert packed.count() == 401  # every doc placed exactly once
    assert packed.select("doc_id").distinct().count() == 401


def test_cumsum_overrun_bounded_by_one_doc(spark, docs_tokens):
    packed = pack_cumsum(
        docs_tokens.filter("doc_id != 1000"), "doc_id", "n_tokens", BUDGET, shards=4
    )
    max_doc = 949  # largest doc in the fixture
    for r in bin_fill_stats(packed, "n_tokens", BUDGET).collect():
        assert r["bin_tokens"] < BUDGET + max_doc
    assert packed.count() == 400


def test_packers_deterministic_across_partitionings(spark, docs_tokens):
    for packer in (pack_cumsum, pack_first_fit):
        a = sorted(
            (r["doc_id"], r["shard"], r["bin_idx"])
            for r in packer(docs_tokens, "doc_id", "n_tokens", BUDGET, shards=4).collect()
        )
        b = sorted(
            (r["doc_id"], r["shard"], r["bin_idx"])
            for r in packer(
                docs_tokens.repartition(13), "doc_id", "n_tokens", BUDGET, shards=4
            ).collect()
        )
        assert a == b, packer.__name__


def test_cumsum_bins_lower_bound_first_fit(spark, docs_tokens):
    """With every doc under the budget, cumsum's bin count per shard is
    ceil(total/budget) — the theoretical optimum (it cheats by letting
    the boundary doc overflow). Budget-respecting FFD must use at least
    that many bins, and not pathologically more (FFD <= 11/9*OPT + 1
    per shard, public bin-packing bound)."""
    df = docs_tokens.filter("doc_id != 1000")
    n_ff = (
        pack_first_fit(df, "doc_id", "n_tokens", BUDGET, shards=4)
        .select("shard", "bin_idx").distinct().count()
    )
    n_cs = (
        pack_cumsum(df, "doc_id", "n_tokens", BUDGET, shards=4)
        .select("shard", "bin_idx").distinct().count()
    )
    assert n_cs <= n_ff <= (11 * n_cs) // 9 + 4  # +1 per shard slack


def test_packing_validation(spark, docs_tokens):
    for packer in (pack_cumsum, pack_first_fit):
        with pytest.raises(ValueError, match="budget"):
            packer(docs_tokens, "doc_id", "n_tokens", 0)
        with pytest.raises(ValueError, match="shards"):
            packer(docs_tokens, "doc_id", "n_tokens", BUDGET, shards=0)


def test_null_ids_agree_with_sql_mirror(spark):
    """NULL ids must behave identically on both engines: last split in
    hash_split (both CASE chains fall through), excluded by
    stratified_sample (NULL predicate)."""
    df = spark.createDataFrame([(None,), (7,)], "doc_id int")
    splits = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", WEIGHTS).collect()}
    assert splits[None] == "test"  # last split in WEIGHTS order
    assert stratified_sample(df, "doc_id", 1.0).count() == 1  # null dropped


def test_first_fit_keeps_payload_and_null_tokens(spark):
    df = spark.createDataFrame(
        [(1, 100, "a"), (2, None, "b"), (3, 900, "c")],
        "doc_id long, n_tokens long, text string",
    )
    rows = {r["doc_id"]: r for r in pack_first_fit(df, "doc_id", "n_tokens", 512, shards=1).collect()}
    assert rows[2]["text"] == "b"  # payload column survives
    assert rows[2]["bin_idx"] is not None and not rows[2]["oversize"]
    assert len(rows) == 3


def test_stratified_sample_rejects_empty_dict(spark, labeled):
    with pytest.raises(ValueError, match="non-empty"):
        stratified_sample(labeled, "doc_id", {}, strata_col="lang")


# ---------------------------------------------------------------------------
# corpus mixture
# ---------------------------------------------------------------------------


def test_mixture_fractions_binding_source():
    from etl_instagram_spark.operators.sampling import mixture_fractions

    # web is abundant, code is scarce relative to its 30% share → code
    # binds (kept whole), web scales down to put code at exactly 30%
    fr = mixture_fractions({"web": 10_000, "code": 900}, {"web": 0.7, "code": 0.3})
    assert fr["code"] == 1.0
    assert fr["web"] == pytest.approx(900 / 0.3 * 0.7 / 10_000)
    with pytest.raises(ValueError, match="same sources"):
        mixture_fractions({"a": 1}, {"b": 0.5})
    with pytest.raises(ValueError, match="> 0"):
        mixture_fractions({"a": 1, "b": 1}, {"a": 0.0, "b": 1.0})


def test_mix_corpora_proportions_and_determinism(spark):
    from etl_instagram_spark.operators.sampling import mix_corpora

    web = spark.range(8000).select(F.col("id").alias("doc_id"))
    code = spark.range(10_000, 11_000).select(F.col("id").alias("doc_id"))
    mixed = mix_corpora(
        {"web": web, "code": code}, {"web": 0.5, "code": 0.5}, "doc_id"
    )
    counts = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # code (1000 rows) binds at 50% share → ~1000 of each
    assert counts["code"] == 1000
    assert counts["web"] == pytest.approx(1000, rel=0.1)

    again = mix_corpora(
        {"web": web, "code": code}, {"web": 0.5, "code": 0.5}, "doc_id"
    )
    assert sorted((r["source"], r["doc_id"]) for r in mixed.collect()) == sorted(
        (r["source"], r["doc_id"]) for r in again.collect()
    )


def test_mix_corpora_weight_raise_only_adds(spark):
    """Raising one source's share must only ADD rows from it (nested
    hash subsets) — existing membership never churns, so a mixture
    re-cut is an incremental diff, not a reshuffle."""
    from etl_instagram_spark.operators.sampling import mix_corpora

    web = spark.range(8000).select(F.col("id").alias("doc_id"))
    code = spark.range(10_000, 11_000).select(F.col("id").alias("doc_id"))
    low = {
        r["doc_id"]
        for r in mix_corpora(
            {"web": web, "code": code}, {"web": 0.8, "code": 0.2}, "doc_id"
        ).filter("source = 'web'").collect()
    }
    high = {
        r["doc_id"]
        for r in mix_corpora(
            {"web": web, "code": code}, {"web": 0.9, "code": 0.1}, "doc_id"
        ).filter("source = 'web'").collect()
    }
    assert low <= high


def test_mix_corpora_weigh_by_tokens(spark):
    from etl_instagram_spark.operators.sampling import mix_corpora

    a = spark.createDataFrame([(i, 100) for i in range(100)], "doc_id long, n_tokens long")
    b = spark.createDataFrame([(1000 + i, 10) for i in range(100)], "doc_id long, n_tokens long")
    mixed = mix_corpora(
        {"a": a, "b": b}, {"a": 0.5, "b": 0.5}, "doc_id", weigh_by="n_tokens"
    )
    tok = {
        r["source"]: r["t"]
        for r in mixed.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    # b has 1000 tokens total and binds at 50% → ~1000 tokens from each side
    assert tok["b"] == 1000
    assert tok["a"] == pytest.approx(1000, rel=0.4)  # 10 docs of 100 tokens


def test_first_fit_oversize_bins_stay_singletons(spark):
    """Zero/null-token docs must never join an oversize bin (its
    capacity is closed, not merely exhausted)."""
    df = spark.createDataFrame(
        [(1, 9000), (2, 0), (3, None), (4, 10)],
        "doc_id long, n_tokens int",
    )
    rows = {r["doc_id"]: r
            for r in pack_first_fit(df, "doc_id", "n_tokens", 512, shards=1).collect()}
    oversize_bin = rows[1]["bin_idx"]
    assert rows[1]["oversize"]
    for d in (2, 3, 4):
        assert rows[d]["bin_idx"] != oversize_bin
        assert not rows[d]["oversize"]


def test_first_fit_matches_python_reference_property(spark):
    """Differential check: the applyInPandas FFD must equal a direct
    Python first-fit-decreasing simulation on the same (tokens, budget),
    bin-for-bin — not just hold its budget/ordering invariants. Random
    token lists cover oversize singletons, exact fits, zero-token docs,
    and budget == 1 edge cases the fixture corpus misses."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_instagram_spark.functions.text import hash32

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        tokens=st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=60),
        budget=st.integers(min_value=1, max_value=100),
    )
    def run(tokens, budget):
        shards = 4
        rows = [(i, t) for i, t in enumerate(tokens)]
        df = spark.createDataFrame(rows, "doc_id long, tokens long")
        packed = pack_first_fit(df, "doc_id", "tokens", budget, shards=shards)
        got = {
            r["doc_id"]: (r["shard"], r["bin_idx"], r["oversize"])
            for r in packed.collect()
        }

        # python reference: identical shard hash, (tokens desc, id) order
        shard_of = {
            r["doc_id"]: r["s"]
            for r in df.select(
                "doc_id", (hash32(F.col("doc_id").cast("string")) % shards).cast("int").alias("s")
            ).collect()
        }
        want = {}
        for s in set(shard_of.values()):
            docs = sorted(
                ((t, i) for i, t in rows if shard_of[i] == s),
                key=lambda x: (-x[0], x[1]),
            )
            caps = []
            for t, i in docs:
                if t > budget:
                    caps.append(-1)
                    want[i] = (s, len(caps) - 1, True)
                    continue
                for b, c in enumerate(caps):
                    if c >= t:
                        caps[b] = c - t
                        want[i] = (s, b, False)
                        break
                else:
                    caps.append(budget - t)
                    want[i] = (s, len(caps) - 1, False)
        assert got == want

    run()


# ---------------------------------------------------------------------------
# repeat_by_weight / shuffle order
# ---------------------------------------------------------------------------

from etl_instagram_spark.operators.sampling import (  # noqa: E402
    repeat_by_weight,
    repeat_sql_copies,
    shuffle_key,
    shuffle_rank,
)


def test_repeat_matches_duckdb_mirror(spark, ids):
    m = 1.7
    got = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in repeat_by_weight(ids, "doc_id", m).collect()
    )
    copies = repeat_sql_copies("doc_id", m)
    want = sorted(
        duckdb.sql(
            f"""SELECT doc_id, unnest(range(1, c + 1)) AS copy_idx
                FROM (SELECT doc_id, {copies}::BIGINT AS c
                      FROM range(2000) t(doc_id))"""
        ).fetchall()
    )
    assert got == want
    # expectation: realized total within hash noise of m*n
    assert abs(len(got) - m * 2000) < 0.05 * 2000


def test_repeat_per_stratum_and_downsample(spark, labeled):
    mult = {"en": 2.0, "es": 0.5}
    out = repeat_by_weight(labeled, "doc_id", mult, strata_col="lang")
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r["lang"]: r["n"]
        for r in labeled.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["en"] == 2 * base["en"]  # integer multiplier: exact
    assert abs(counts["es"] - 0.5 * base["es"]) < 0.15 * base["es"]
    # unlisted strata keep multiplier 1.0
    for lang in base:
        if lang not in mult:
            assert counts.get(lang, 0) == base[lang]
    # deterministic across partitionings
    again = repeat_by_weight(
        labeled.repartition(7), "doc_id", mult, strata_col="lang"
    )
    key = lambda df: sorted(
        (r["doc_id"], r["copy_idx"]) for r in df.select("doc_id", "copy_idx").collect()
    )
    assert key(out) == key(again)


def test_repeat_validation(spark, ids):
    with pytest.raises(ValueError, match=">= 0"):
        repeat_by_weight(ids, "doc_id", -0.5).collect()
    with pytest.raises(ValueError, match="strata_col"):
        repeat_by_weight(ids, "doc_id", {"en": 2.0})


def test_shuffle_rank_matches_duckdb_and_is_growth_stable(spark, labeled):
    from etl_instagram_spark.operators.sampling import bucket_sql

    ranked = shuffle_rank(labeled, "doc_id", "lang")
    got = sorted(
        (r["lang"], r["shuffle_rank"], r["doc_id"]) for r in ranked.collect()
    )
    b = bucket_sql("doc_id", "shuffle")
    want = sorted(
        duckdb.sql(
            f"""SELECT lang,
                       row_number() OVER (PARTITION BY lang ORDER BY {b}, doc_id)
                         AS shuffle_rank,
                       doc_id
                FROM (SELECT doc_id,
                             CASE WHEN doc_id % 3 = 0 THEN 'en'
                                  ELSE 'es' END AS lang
                      FROM range(3000) t(doc_id))"""
        ).fetchall()
    )
    assert got == want

    # growth stability: adding rows never flips existing relative order
    half = labeled.filter(F.col("doc_id") < 1500)
    order_half = [
        r["doc_id"]
        for r in shuffle_rank(half, "doc_id", "lang")
        .filter(F.col("lang") == "en")
        .orderBy("shuffle_rank")
        .collect()
    ]
    order_full = [
        r["doc_id"]
        for r in shuffle_rank(labeled, "doc_id", "lang")
        .filter((F.col("lang") == "en") & (F.col("doc_id") < 1500))
        .orderBy("shuffle_rank")
        .collect()
    ]
    assert order_half == order_full
    # a different salt is a different permutation
    other = [
        r["doc_id"]
        for r in shuffle_rank(half, "doc_id", "lang", salt="epoch2")
        .filter(F.col("lang") == "en")
        .orderBy("shuffle_rank")
        .collect()
    ]
    assert other != order_half and sorted(other) == sorted(order_half)


def test_shuffle_key_global_write_order(spark, ids, tmp_path):
    """The scale path: range-repartition + sort on shuffle_key yields a
    globally ordered layout (every file's key range is disjoint and
    files concatenate to the exact permutation) with no 1-task sort."""
    key = shuffle_key(F.col("doc_id"))
    p = str(tmp_path / "shuffled")
    (
        ids.repartitionByRange(8, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(p)
    )
    import glob

    perm = []
    for f in sorted(glob.glob(f"{p}/part-*.parquet")):
        perm.extend(r["doc_id"] for r in spark.read.parquet(f).collect())
    # expected: ids ordered by (bucket, id) — replay via the rank window
    expect = [
        r["doc_id"]
        for r in shuffle_rank(
            ids.withColumn("g", F.lit(1)), "doc_id", "g"
        ).orderBy("shuffle_rank").collect()
    ]
    assert sorted(perm) == sorted(expect)
    # file order == key order requires files sorted by their range; part
    # file names are ordered by partition id, which repartitionByRange
    # assigns in key order
    assert perm == expect


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

from etl_instagram_spark.operators.packing import chunk_documents  # noqa: E402


@pytest.fixture()
def chunk_docs(spark):
    rows = [
        (1, "a b c d e f g h i j"),          # 10 tokens
        (2, "one two three"),                # shorter than a chunk
        (3, ""),                             # blank -> one empty chunk
        (4, "  X   y\tZ  "),                 # messy whitespace + case
        (5, " ".join(f"t{i}" for i in range(23))),
        (6, "\tlead tab"),                   # tab-edged text
        (7, "\n"),                           # newline-only == blank
        (8, None),                            # NULL text == blank
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_documents_tiling_and_tail(spark, chunk_docs):
    out = chunk_documents(chunk_docs, "doc_id", "text", chunk_tokens=4)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in out.collect()
    }
    assert got[(1, 0)] == ("a b c d", 4)
    assert got[(1, 1)] == ("e f g h", 4)
    assert got[(1, 2)] == ("i j", 2)  # ragged tail kept
    assert got[(2, 0)] == ("one two three", 3)
    assert got[(3, 0)] == ("", 0)  # blank doc never disappears
    assert got[(4, 0)] == ("X y Z", 3)  # case preserved
    assert max(i for d, i in got if d == 5) == 5  # 23 tokens / 4 -> 6 chunks
    assert got[(6, 0)] == ("lead tab", 2)  # no phantom empty token
    assert got[(7, 0)] == ("", 0)  # whitespace-only == blank
    assert got[(8, 0)] == ("", 0)  # NULL text == blank, doc not dropped
    # exact tiling: concatenating non-overlap chunks reproduces the tokens
    parts = [got[(5, i)][0] for i in range(6)]
    assert " ".join(parts).split() == [f"t{i}" for i in range(23)]


def test_chunk_documents_stride_overlap_matches_duckdb(spark, chunk_docs):
    chunk, stride = 5, 3
    out = chunk_documents(
        chunk_docs, "doc_id", "text", chunk_tokens=chunk, stride=stride
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in out.collect()
    )
    rows = [(r["doc_id"], r["text"]) for r in chunk_docs.collect()]
    import pandas as pd  # noqa: F401

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = sorted(
        con.sql(
            f"""
        WITH t AS (SELECT doc_id,
                          list_filter(
                            regexp_split_to_array(coalesce(text, ''),
                                                  '[ \\t\\n\\x0B\\f\\r]+'),
                            x -> x <> '') AS toks
                   FROM d),
             c AS (SELECT doc_id, toks,
                          1 + CAST(ceil(greatest(len(toks) - {chunk}, 0)::DOUBLE
                                        / {stride}) AS INT) AS nc
                   FROM t)
        SELECT doc_id, i AS chunk_idx,
               coalesce(array_to_string(toks[1 + i*{stride} : i*{stride} + {chunk}],
                                        ' '), '') AS chunk_text
        FROM c CROSS JOIN unnest(range(nc)) u(i)
        """
        ).fetchall()
    )
    assert got == want
    # overlap property: consecutive chunks share chunk-stride tokens
    ten = {r[1]: r[2] for r in got if r[0] == 1}
    assert ten[0].split()[stride:] == ten[1].split()[: chunk - stride]


def test_chunk_documents_validation(spark, chunk_docs):
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(chunk_docs, "doc_id", "text", 0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(chunk_docs, "doc_id", "text", 4, stride=5)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["Foo", "bar", "BAZ", "qux"]), max_size=15).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    ),
    chunk=st.integers(min_value=1, max_value=6),
    stride_off=st.integers(min_value=0, max_value=5),
)
def test_chunk_documents_property_vs_python(spark, texts, chunk, stride_off):
    """Any corpus, any (chunk, stride): windows match a direct Python
    reference, every token position is covered, and case survives."""
    stride = max(1, chunk - stride_off)
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=chunk, stride=stride
        ).collect()
    }
    import math
    import re

    for i, text in rows:
        toks = [] if not text.strip() else re.split(r"\s+", text.strip())
        nc = 1 + math.ceil(max(0, len(toks) - chunk) / stride)
        for c in range(nc):
            want = toks[c * stride : c * stride + chunk]
            assert got[(i, c)] == (" ".join(want), len(want)), (i, c)
        assert (i, nc) not in got


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    mult=st.floats(min_value=0.0, max_value=4.0).map(lambda x: round(x, 3)),
    n=st.integers(min_value=1, max_value=300),
)
def test_repeat_property_matches_mirror_and_expectation(spark, mult, n):
    """Any multiplier, any size: the copy set equals the DuckDB replay
    exactly, per-row copies ∈ {floor(m), floor(m)+1}, and copy_idx is
    dense 1..copies."""
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    got = sorted(
        (r["doc_id"], r["copy_idx"])
        for r in repeat_by_weight(df, "doc_id", mult).collect()
    )
    copies = repeat_sql_copies("doc_id", mult)
    want = sorted(
        duckdb.sql(
            f"""SELECT doc_id, unnest(range(1, c + 1)) AS copy_idx
                FROM (SELECT doc_id, {copies}::BIGINT AS c
                      FROM range({n}) t(doc_id))"""
        ).fetchall()
    )
    assert got == want
    from collections import Counter

    per_row = Counter(d for d, _ in got)
    lo = int(mult)
    for d in range(n):
        c = per_row.get(d, 0)
        assert c in (lo, lo + 1), (d, c, mult)
        assert [i for dd, i in got if dd == d] == list(range(1, c + 1))


# ---------------------------------------------------------------------------
# cap_per_group (per-domain frequency capping)
# ---------------------------------------------------------------------------


@pytest.fixture()
def domain_docs(spark):
    """60 docs over 4 domains with skew: d0×30, d1×20, d2×8, d3×2."""
    rows = []
    i = 0
    for dom, n in (("d0", 30), ("d1", 20), ("d2", 8), ("d3", 2)):
        for _ in range(n):
            rows.append((i, dom, i * 7 % 100))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, domain string, score long")


def test_cap_per_group_caps_and_matches_duckdb(spark, domain_docs):
    """Cap respected, under-cap groups untouched, and the kept SET (not
    just the counts) replays through cap_rank_sql on DuckDB."""
    from etl_instagram_spark.operators.sampling import cap_per_group, cap_rank_sql

    out = cap_per_group(domain_docs, "domain", "doc_id", 10, salt="t")
    per = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"d0": 10, "d1": 10, "d2": 8, "d3": 2}
    kept = sorted(r["doc_id"] for r in out.collect())
    con = duckdb.connect()
    con.register("docs", domain_docs.toPandas())
    rn = cap_rank_sql("doc_id", "domain", salt="t")
    want = sorted(
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM (SELECT doc_id, {rn} AS rn FROM docs) WHERE rn <= 10"
        ).fetchall()
    )
    con.close()
    assert kept == want


def test_cap_per_group_partitioning_independent(spark, domain_docs):
    """The kept set is a pure function of (id, salt) — cluster layout
    must not change which rows survive."""
    from etl_instagram_spark.operators.sampling import cap_per_group

    one = cap_per_group(domain_docs.repartition(1), "domain", "doc_id", 5)
    many = cap_per_group(domain_docs.repartition(7, "score"), "domain", "doc_id", 5)
    assert sorted(r["doc_id"] for r in one.collect()) == sorted(
        r["doc_id"] for r in many.collect()
    )


def test_cap_per_group_prefer_keeps_best(spark, domain_docs):
    """With a prefer column the cap keeps the top-n by that ordering."""
    from etl_instagram_spark.operators.sampling import cap_per_group

    out = cap_per_group(
        domain_docs, "domain", "doc_id", 3, prefer=F.col("score").desc()
    )
    got = {
        r["domain"]: sorted(r["scores"], reverse=True)
        for r in out.groupBy("domain")
        .agg(F.collect_list("score").alias("scores"))
        .collect()
    }
    want = {
        r["domain"]: sorted(r["scores"], reverse=True)[:3]
        for r in domain_docs.groupBy("domain")
        .agg(F.collect_list("score").alias("scores"))
        .collect()
    }
    assert got == want


def test_cap_per_group_validation(spark, domain_docs):
    from etl_instagram_spark.operators.sampling import cap_per_group

    with pytest.raises(ValueError, match="n must be"):
        cap_per_group(domain_docs, "domain", "doc_id", 0)


def test_cap_per_group_null_id_ranks_identically_on_both_engines(spark):
    """A NULL id hashes to a NULL bucket (the _bucket contract) and
    Spark's asc() puts nulls FIRST — cap_rank_sql spells NULLS FIRST so
    DuckDB agrees instead of silently ranking the row last."""
    from etl_instagram_spark.operators.sampling import cap_per_group, cap_rank_sql

    rows = [(None, "g"), (1, "g"), (2, "g"), (3, "g")]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = sorted(
        (r["doc_id"] is None, r["doc_id"] or 0)
        for r in cap_per_group(df, "domain", "doc_id", 2).collect()
    )
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    rn = cap_rank_sql("doc_id", "domain")
    want = sorted(
        (r[0] is None, int(r[0]) if r[0] is not None else 0)
        for r in con.sql(
            f"SELECT doc_id FROM (SELECT doc_id, {rn} AS rn FROM docs) WHERE rn <= 2"
        ).fetchall()
    )
    con.close()
    assert kept == want
    assert (True, 0) in kept  # the NULL row ranked first on both engines


def test_temperature_weights_limits_and_monotonicity():
    from etl_instagram_spark.operators.sampling import temperature_weights

    avail = {"big": 1_000_000.0, "mid": 10_000.0, "small": 100.0}
    natural = temperature_weights(avail, alpha=1.0)
    assert natural["big"] == pytest.approx(1_000_000 / 1_010_100)
    uniform = temperature_weights(avail, alpha=0.0)
    assert all(v == pytest.approx(1 / 3) for v in uniform.values())
    tempered = temperature_weights(avail, alpha=0.3)
    # lifts the tail relative to natural, but big still leads
    assert tempered["small"] > natural["small"]
    assert tempered["big"] > tempered["mid"] > tempered["small"]
    assert sum(tempered.values()) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        temperature_weights({}, 0.3)
    with pytest.raises(ValueError):
        temperature_weights({"a": 0.0}, 0.3)
    with pytest.raises(ValueError):
        temperature_weights(avail, -0.1)


def test_temperature_weights_compose_with_mixture(spark):
    """alpha-tempered weights flow straight into mix_corpora: the
    low-resource source is kept whole (binding) and the big source is
    down-sampled toward the tempered share."""
    from etl_instagram_spark.operators.sampling import (
        mix_corpora,
        temperature_weights,
    )

    big = spark.range(900).selectExpr("id AS doc_id")
    small = spark.range(100).selectExpr("id + 10000 AS doc_id")
    w = temperature_weights({"big": 900.0, "small": 100.0}, alpha=0.3)
    mixed = mix_corpora({"big": big, "small": small}, w, "doc_id")
    counts = {r["source"]: r["n"] for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 100  # binding source kept whole
    # big is sampled to approximately small * w_big / w_small
    want_big = 100 * w["big"] / w["small"]
    assert abs(counts["big"] - want_big) / want_big < 0.2
