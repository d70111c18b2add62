"""Unit tests for the text-analysis column kernels (functions/text.py).

Every kernel is exercised on small literal frames; hash parity is checked
against an independent Python md5 computation (the same definition the
DuckDB oracle uses)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.functions import stopwords
from etl_instagram_spark.functions import text as T


def py_hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def texts_df(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "text string")


def test_tokens_and_count(spark):
    df = texts_df(spark, ["  Hello   World FOO ", "", "   ", "one"])
    out = df.select(
        T.tokens(F.col("text")).alias("t"), T.token_count(F.col("text")).alias("n")
    ).collect()
    assert out[0]["t"] == ["hello", "world", "foo"] and out[0]["n"] == 3
    assert out[1]["n"] == 0 and out[2]["n"] == 0
    assert out[3]["t"] == ["one"] and out[3]["n"] == 1


def test_bpe_token_count_vs_duckdb_and_python(spark):
    """BPE-ish pre-tokenizer counts must agree with the DuckDB mirror
    (RE2) and a Python re reference on punctuation/code-heavy text that
    whitespace counting undercounts."""
    import duckdb

    rows = [
        "Hello, world! It's fine.",
        "def f(x): return x+1  # comment",
        "café número 42",
        "",
        "   ",
        "a--b__c 3.14 won't",
    ]
    got = [
        r["n"]
        for r in texts_df(spark, rows)
        .select(T.bpe_token_count(F.col("text")).alias("n"))
        .collect()
    ]
    # cross-engine: Java regex (Spark) vs RE2 (DuckDB, the oracle engine)
    con = duckdb.connect()
    for text, n in zip(rows, got):
        want = con.execute(
            f"SELECT {T.bpe_token_count_sql('?')} AS n", [text]
        ).fetchone()[0]
        assert n == want, (text, n, want)
    # sanity: punctuation splits into pieces whitespace counting misses
    ws = [
        r["n"]
        for r in texts_df(spark, rows)
        .select(T.token_count(F.col("text")).alias("n"))
        .collect()
    ]
    assert got[1] > ws[1] and got[1] >= 10
    assert got[3] == 0 and got[4] == 1  # "" → 0 pieces; "   " → one ws run


def test_hash32_matches_md5(spark):
    for s in ["hello world", "", "ünïcode ✓", "a b c"]:
        got = one(spark, T.hash32(F.lit(s)))
        assert got == py_hash32(s), s


def test_affine_hash_range_and_determinism(spark):
    h = py_hash32("token")
    for a, b in T.minhash_coefficients(4):
        got = one(spark, T.affine_hash(F.lit(h).cast("long"), a, b))
        assert got == (a * (h % T.HASH_PRIME) + b) % T.HASH_PRIME
        assert 0 <= got < T.HASH_PRIME


def test_word_shingles(spark):
    df = texts_df(spark, ["one two three four", "just two"])
    out = df.select(T.word_shingles(F.col("text"), 3).alias("s")).collect()
    assert out[0]["s"] == ["one two three", "two three four"]
    assert out[1]["s"] == ["just two"]  # shorter than n → whole text


def test_char_shingles_and_fingerprint(spark):
    out = one(spark, T.char_shingles(F.lit("abcdefgh"), 4))
    assert out == ["abcd", "bcde", "cdef", "defg", "efgh"]
    fp1 = one(spark, T.rolling_fingerprint(F.lit("the quick brown fox")))
    fp2 = one(spark, T.rolling_fingerprint(F.lit("the quick brown fox")))
    fp3 = one(spark, T.rolling_fingerprint(F.lit("the quick brown cat")))
    assert fp1 == fp2 != fp3
    assert fp1 == min(py_hash32("the quick brown fox"[i : i + 8]) for i in range(12))


def test_minhash_signature_properties(spark):
    sig_a = one(spark, T.minhash_signature(F.lit("spark rewrites the plan with catalyst rules"), k=8))
    sig_b = one(spark, T.minhash_signature(F.lit("spark rewrites the plan with catalyst rules"), k=8))
    sig_c = one(spark, T.minhash_signature(F.lit("completely different words entirely here now"), k=8))
    assert sig_a == sig_b and len(sig_a) == 8
    assert sig_a != sig_c
    # near-duplicate texts share most signature slots
    sig_d = one(spark, T.minhash_signature(F.lit("spark rewrites the plan with catalyst rule"), k=8))
    assert sum(x == y for x, y in zip(sig_a, sig_d)) >= 4


def test_simhash_and_hamming(spark):
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = a.replace("dog", "cat")
    c = "totally unrelated content about databases and distributed query engines"
    df = spark.createDataFrame([(a, b), (a, c), (a, a)], "x string, y string")
    out = df.select(
        T.simhash_hamming(T.simhash(F.col("x")), T.simhash(F.col("y"))).alias("d")
    ).collect()
    d_near, d_far, d_same = out[0]["d"], out[1]["d"], out[2]["d"]
    assert d_same == 0
    assert d_near < d_far


def test_quality_and_ratios(spark):
    good = (
        "This is a well formed paragraph of natural prose that continues for a "
        "while and contains the usual mixture of the stopwords that real text has."
    )
    bad = "!!! ??? ;;; ::: ,,, ..."
    df = texts_df(spark, [good, bad, ""])
    out = df.select(
        T.quality_score(F.col("text")).alias("q"),
        T.punct_ratio(F.col("text")).alias("p"),
        T.stopword_ratio(F.col("text")).alias("s"),
        T.mean_token_len(F.col("text")).alias("m"),
    ).collect()
    assert out[0]["q"] > 0.8 > out[1]["q"]
    assert out[1]["p"] > 0.5 and out[0]["p"] < 0.1
    assert out[0]["s"] > 0.2 and out[1]["s"] == 0.0
    assert out[2]["q"] <= 0.2 and out[2]["m"] == 0.0
    assert abs(out[0]["m"] - (len(good.split()) and sum(map(len, good.split())) / len(good.split()))) < 1e-9


def test_detect_language(spark):
    df = texts_df(
        spark,
        [
            "the cat sat on the mat and looked at the dog",
            "el perro corre en la calle y los gatos duermen",
            "le chat dort dans les maisons et une souris passe",
            "der hund und die katze sind nicht ein problem mit",
            "zzz qqq xxx",  # no markers → und
        ],
    )
    out = [r["l"] for r in df.select(T.detect_language(F.col("text")).alias("l")).collect()]
    assert out == ["en", "es", "fr", "de", "und"]


def test_stopword_lists():
    assert "the" in stopwords.EN and "que" in stopwords.ES
    both = stopwords.combined(("es",))
    assert "the" in both and "que" in both  # es includes en (stopwords_es.js:1)
    assert stopwords.combined(("en",)) == sorted(stopwords.EN)
    with pytest.raises(KeyError):
        stopwords.combined(("xx",))


def test_sentences_reference_regex(spark):
    df = texts_df(spark, ["One. Two! Three? trailing no end", "no terminator at all", ""])
    out = df.select(T.sentences(F.col("text")).alias("s"), T.sentence_count(F.col("text")).alias("n")).collect()
    assert out[0]["s"] == ["One.", " Two!", " Three?"] and out[0]["n"] == 3
    assert out[1]["s"] == [] and out[1]["n"] == 0
    assert out[2]["n"] == 0


def test_haversine_known_distances(spark):
    from etl_instagram_spark.functions import geo

    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278),   # Paris -> London ~343.5 km
         (40.7128, -74.0060, 34.0522, -118.2437),  # NYC -> LA ~3936 km
         (0.0, 0.0, 0.0, 0.0)],
        "lat1 double, lng1 double, lat2 double, lng2 double",
    )
    out = [
        r["d"]
        for r in df.select(
            geo.haversine_km(F.col("lat1"), F.col("lng1"), F.col("lat2"), F.col("lng2")).alias("d")
        ).collect()
    ]
    assert abs(out[0] - 343.5) < 1.0
    assert abs(out[1] - 3936) < 10
    assert out[2] == 0.0
    hit = df.select(
        geo.within_radius_km(F.col("lat1"), F.col("lng1"), F.col("lat2"), F.col("lng2"), 500.0).alias("w")
    ).collect()
    assert [r["w"] for r in hit] == [True, False, True]


# ---------------------------------------------------------------------------
# URL canonicalization (functions/url.py)
# ---------------------------------------------------------------------------


def test_canonicalize_url_rules(spark):
    from pyspark.sql import functions as F

    from etl_instagram_spark.functions.url import canonicalize_url

    cases = [
        ("HTTP://Example.COM/Path?b=2&utm_source=x&a=1#frag",
         "http://example.com/Path?a=1&b=2"),
        ("https://host:443/a", "https://host/a"),
        ("http://host:80/a?", "http://host/a"),
        ("https://host:8443/a", "https://host:8443/a"),
        # https on port 80 is NOT the default port — it must survive
        ("https://host:80/a", "https://host:80/a"),
        ("http://host:443/a", "http://host:443/a"),
        ("https://h/p?utm_campaign=z&fbclid=1", "https://h/p"),
        ("https://h/p?z=1&y=2&ref=home", "https://h/p?y=2&z=1"),
        ("https://h/CaseKept/Path", "https://h/CaseKept/Path"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, url string")
    got = {r["i"]: r["c"] for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_canonicalize_url_sql_mirror_agrees(spark):
    import duckdb
    from pyspark.sql import functions as F

    from etl_instagram_spark.functions.url import canonicalize_url, canonicalize_url_sql

    urls = [
        "HTTP://Example.COM/Path?b=2&utm_source=x&a=1#frag",
        "https://host:443/a?gclid=7",
        "https://host:80/a",
        "http://host:443/a",
        "http://h:80/p?x=1&x=0",
        "https://h/p",
        "ftp://Weird.Host/file",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    spark_out = [
        r["c"]
        for r in df.select("i", canonicalize_url(F.col("url")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    duck_out = [
        r[0]
        for r in con.sql(
            "SELECT " + canonicalize_url_sql("url") + " FROM (SELECT unnest(?) AS url)",
            params=[urls],
        ).fetchall()
    ]
    assert spark_out == duck_out


def test_unicode_normalize_forms(spark):
    """UAX #15 semantics: NFC composes combining pairs, NFD decomposes,
    NFKC folds compatibility forms (ligature fi, the Angstrom sign),
    NULLs pass through, idempotence, loud unknown-form guard."""
    import pytest

    from pyspark.sql import functions as F

    from etl_instagram_spark.functions.unicodenorm import unicode_normalize

    rows = [
        (0, "café"),   # cafe + combining acute -> café
        (1, "Å"),            # Angstrom sign
        (2, "ﬁle"),          # ligature fi + "le"
        (3, None),
        (4, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "i long, s string")
    out = {
        r["i"]: (r["nfc"], r["nfkc"], r["nfd"])
        for r in df.select(
            "i",
            unicode_normalize(F.col("s"), "NFC").alias("nfc"),
            unicode_normalize(F.col("s"), "NFKC").alias("nfkc"),
            unicode_normalize(F.col("s"), "NFD").alias("nfd"),
        ).collect()
    }
    assert out[0][0] == "café"            # composed
    assert out[0][2] == "café"           # decomposed
    assert out[1][0] == "Å"               # NFC: Angstrom -> Å (canonical)
    assert out[1][1] == "Å"               # NFKC agrees here
    assert out[2][0] == "ﬁle"             # NFC keeps the ligature
    assert out[2][1] == "file"                 # NFKC folds it
    assert out[3] == (None, None, None)
    assert out[4] == ("plain ascii",) * 3
    # idempotence: normalizing twice is a no-op
    twice = df.select(
        unicode_normalize(
            unicode_normalize(F.col("s"), "NFC"), "NFC"
        ).alias("a"),
        unicode_normalize(F.col("s"), "NFC").alias("b"),
    ).collect()
    assert all(r["a"] == r["b"] for r in twice)
    with pytest.raises(ValueError, match="unknown normalization form"):
        unicode_normalize(F.col("s"), "NFX")


def test_unicode_normalize_makes_dedup_keys_agree(spark):
    """The operational property: two composition variants of the same
    text hash identically AFTER NFC and differently before."""
    from pyspark.sql import functions as F

    from etl_instagram_spark.functions.text import hash32
    from etl_instagram_spark.functions.unicodenorm import unicode_normalize

    df = spark.createDataFrame(
        [("a", "résumé"), ("b", "résumé")],
        "k string, s string",
    )
    raw = {r["k"]: r["h"] for r in df.select("k", hash32(F.col("s")).alias("h")).collect()}
    norm = {
        r["k"]: r["h"]
        for r in df.select(
            "k", hash32(unicode_normalize(F.col("s"), "NFC")).alias("h")
        ).collect()
    }
    assert raw["a"] != raw["b"]
    assert norm["a"] == norm["b"]
