"""Layout-operator tests: bucketed joins eliminate the Exchange; salted
joins preserve results while spreading hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_instagram_spark.operators.layout import (
    bucketed_join,
    exchange_count,
    salted_join,
    write_bucketed,
)


@pytest.fixture()
def orders_lineitem(spark, sf_smoke):
    from etl_instagram_spark.sources.tables import load_table

    return load_table(spark, sf_smoke, "orders"), load_table(spark, sf_smoke, "lineitem")


def test_bucketed_join_has_no_exchange(spark, orders_lineitem):
    od, li = orders_lineitem
    write_bucketed(od, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", n_buckets=4
    )
    # disable broadcast so the fact-fact (sort-merge) path is exercised —
    # at sf0.001 everything fits the 64MB threshold and would broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        assert exchange_count(joined) == 0  # co-located: no shuffle at all

        # same join on the raw (unbucketed) frames shuffles both sides
        raw = od.join(li, od.o_orderkey == li.l_orderkey)
        assert exchange_count(raw) > 0

        # and the result matches the raw join
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(["hot"] * 50 + ["cold1", "cold2"] * 5)],
        "k string, payload long",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("cold2", "C2"), ("unmatched", "X")], "k string, v string"
    )
    plain = fact.join(dim, "k").select("k", "payload", "v")
    salted = salted_join(fact, dim, "k", salt_buckets=4).select("k", "payload", "v")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left joins are fact-preserving and stay equivalent too
    plain_l = fact.join(dim, "k", "left").select("k", "payload", "v")
    salted_l = salted_join(fact, dim, "k", salt_buckets=4, how="left").select(
        "k", "payload", "v"
    )
    assert sorted(map(tuple, salted_l.collect())) == sorted(map(tuple, plain_l.collect()))
    # dim-preserving joins would duplicate unmatched replicas → refused
    import pytest as _pytest

    for bad in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(fact, dim, "k", how=bad)
    # the hot key is spread across multiple salt partitions pre-join
    spread = (
        fact.withColumn("__salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(4))).cast("int"))
        .filter(F.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread > 1
