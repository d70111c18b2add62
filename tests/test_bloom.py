"""Bloom membership filters (functions/bloom.py) and their use as the
decontamination scan-stage pre-filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.functions.bloom import (
    bloom_frame,
    bloom_parameters,
    build_bloom,
    might_contain,
)


def test_bloom_parameters_sizing():
    m, k = bloom_parameters(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/item at 1%
    assert 1 <= k <= 8
    with pytest.raises(ValueError):
        bloom_parameters(0, 0.01)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    members = spark.range(2000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("v")
    )
    m_bits, k = bloom_parameters(2000, 0.01)
    words = build_bloom(members, "v", m_bits, k)
    bf = bloom_frame(spark, words)
    # every inserted value tests positive — the hard guarantee
    hits = (
        members.crossJoin(F.broadcast(bf))
        .where(might_contain(F.col("v"), F.col("__bloom"), m_bits, k))
        .count()
    )
    assert hits == 2000
    # non-members pass at ~fpp (generous cap: 5x the design point)
    others = spark.range(10_000).select(
        F.concat(F.lit("other_"), F.col("id")).alias("v")
    )
    fp = (
        others.crossJoin(F.broadcast(bf))
        .where(might_contain(F.col("v"), F.col("__bloom"), m_bits, k))
        .count()
    )
    assert fp / 10_000 < 0.05, fp
    # NULL is never a member
    nulls = spark.createDataFrame([(None,)], "v string")
    assert (
        nulls.crossJoin(F.broadcast(bf))
        .where(might_contain(F.col("v"), F.col("__bloom"), m_bits, k))
        .count()
        == 0
    )


def test_build_bloom_validates_m_bits(spark):
    df = spark.range(1).select(F.lit("x").alias("v"))
    with pytest.raises(ValueError):
        build_bloom(df, "v", 63, 2)
    with pytest.raises(ValueError):
        build_bloom(df, "v", 0, 2)


def test_decontamination_bloom_prefilter_is_lossless(spark, sf_smoke):
    """flag_contaminated with the Bloom pre-filter must return the
    IDENTICAL classification and hit counts — the filter can only drop
    shingles the exact join would drop anyway."""
    from etl_instagram_spark.operators.cleanup import flag_contaminated

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(150)
    # benchmark: phrases lifted verbatim from two docs + a novel item
    picked = docs.orderBy("doc_id").limit(2).collect()
    bench_rows = [
        (" ".join((r["text"] or "").split()[:20]),) for r in picked
    ] + [("completely novel benchmark question nobody wrote about",)]
    bench = spark.createDataFrame(bench_rows, "text string")

    def snap(df):
        return sorted(
            (r["doc_id"], r["contaminated"], r["n_hit_shingles"])
            for r in df.collect()
        )

    plain = snap(flag_contaminated(docs, bench, "doc_id", "text", n=13))
    bloomed = snap(
        flag_contaminated(
            docs, bench, "doc_id", "text", n=13, bloom_fpp=0.001
        )
    )
    assert plain == bloomed
    assert any(c for _, c, _ in plain)  # the lifted phrases really hit


def test_bloom_prefilter_prunes_most_shingles(spark, sf_smoke):
    """The scale claim, measured: with a tiny eval set, the pre-filter
    passes only a sliver of the corpus shingle stream to the join."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(200)
    shingles = docs.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.size(F.split(F.trim(F.lower("text")), r"\s+")) - 12,
                        F.lit(1),
                    ),
                ),
                lambda i: F.md5(
                    F.array_join(
                        F.slice(
                            F.split(F.trim(F.lower("text")), r"\s+"), i, 13
                        ),
                        " ",
                    )
                ),
            )
        ).alias("k")
    )
    total = shingles.count()
    bench = spark.createDataFrame(
        [("one tiny eval question that matches nothing in the corpus",)],
        "text string",
    )
    keys = bench.select(F.md5(F.lit("whatever")).alias("k")).limit(1)
    m_bits, k = bloom_parameters(10, 0.001)
    words = build_bloom(keys, "k", m_bits, k)
    bf = bloom_frame(spark, words)
    survived = (
        shingles.crossJoin(F.broadcast(bf))
        .where(might_contain(F.col("k"), F.col("__bloom"), m_bits, k))
        .count()
    )
    assert total > 1000
    assert survived / total < 0.05, (survived, total)
