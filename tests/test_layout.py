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


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def _py_interleave(coords: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for i, c in enumerate(coords):
            z |= ((c >> b) & 1) << (b * len(coords) + i)
    return z


def test_zorder_key_matches_python_interleave(spark):
    from etl_instagram_spark.operators.layout import zorder_key

    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x int, y int")
    # ranges [0,3] with bits=2: grid == the raw coordinate
    z = zorder_key([F.col("x"), F.col("y")], [(0, 3), (0, 3)], bits=2)
    got = {(r["x"], r["y"]): r["z"] for r in df.withColumn("z", z).collect()}
    for x, y in rows:
        assert got[(x, y)] == _py_interleave([x, y], 2), (x, y)


def test_zorder_key_null_and_constant_columns(spark):
    from etl_instagram_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(None, 5), (2, 5)], "x int, c int")
    z = zorder_key([F.col("x"), F.col("c")], [(0, 3), (5, 5)], bits=2)
    vals = [r["z"] for r in df.withColumn("z", z).collect()]
    assert vals[0] == 0  # null x → grid 0; constant c → grid 0
    assert vals[1] == _py_interleave([2, 0], 2)


def _file_hit_fractions(path: str, probe_x: float, probe_y: float):
    """Fraction of parquet files whose [min,max] footer range contains
    the probe, per column — the file-skipping a stats-aware scan gets."""
    import glob

    import duckdb

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hits_x = hits_y = 0
    for f in files:
        mnx, mxx, mny, mxy = duckdb.sql(
            f"SELECT min(x), max(x), min(y), max(y) FROM '{f}'"
        ).fetchone()
        hits_x += mnx <= probe_x <= mxx
        hits_y += mny <= probe_y <= mxy
    return hits_x / len(files), hits_y / len(files), len(files)


def test_write_zordered_prunes_on_both_columns(spark, tmp_path):
    """The layout claim, measured: z-ordered files are clustered on BOTH
    columns (a probe on either hits a minority of files), while the
    single-column sort prunes one dimension and rescans the other."""
    import random

    from etl_instagram_spark.operators.layout import write_zordered

    rng = random.Random(7)
    rows = [(rng.randrange(64), rng.randrange(64)) for _ in range(4096)]
    df = spark.createDataFrame(rows, "x int, y int")

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=6)
    zx, zy, nz = _file_hit_fractions(zpath, 31.5, 31.5)
    assert nz == 16
    # each file ≈ a 16×16 block of the 64×64 grid → ~4/16 files per probe;
    # unaligned range cuts can straddle blocks, hence the 0.6 ceiling
    assert zx <= 0.6 and zy <= 0.6, (zx, zy)

    lpath = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lx, ly, _ = _file_hit_fractions(lpath, 31.5, 31.5)
    assert lx <= 0.2  # sort column prunes perfectly
    assert ly == 1.0  # the other column cannot prune at all


def test_write_zordered_empty_input(spark, tmp_path):
    from etl_instagram_spark.operators.layout import write_zordered

    df = spark.createDataFrame([], "x int, y int")
    p = str(tmp_path / "empty")
    write_zordered(df, p, ["x", "y"], n_files=4)
    assert spark.read.parquet(p).count() == 0


def test_zorder_key_rejects_long_overflow(spark):
    """bits*ncols > 63 would wrap shifts mod 64 (merging distinct cells)
    or hit the sign bit (inverting range order) — must be refused."""
    from etl_instagram_spark.operators.layout import zorder_key

    cols = [F.col(c) for c in "abcd"]
    with pytest.raises(ValueError, match="<= 63"):
        zorder_key(cols, [(0, 1)] * 4, bits=16)
    # 4 cols at bits=15 (60 bits) is fine
    zorder_key(cols, [(0, 1)] * 4, bits=15)


def test_write_zordered_three_columns(spark, tmp_path):
    """Three-dimension clustering still prunes on every column (bits=16
    × 3 cols = 48 key bits — inside the long-overflow guard)."""
    import glob
    import random

    import duckdb

    from etl_instagram_spark.operators.layout import write_zordered

    rng = random.Random(11)
    rows = [
        (rng.randrange(64), rng.randrange(64), rng.randrange(64))
        for _ in range(4096)
    ]
    df = spark.createDataFrame(rows, "x int, y int, z int")
    p = str(tmp_path / "z3")
    write_zordered(df, p, ["x", "y", "z"], n_files=16, bits=6)
    files = sorted(glob.glob(f"{p}/part-*.parquet"))
    assert len(files) == 16
    hits = {"x": 0, "y": 0, "z": 0}
    for f in files:
        stats = duckdb.sql(
            f"SELECT min(x), max(x), min(y), max(y), min(z), max(z) FROM '{f}'"
        ).fetchone()
        for i, c in enumerate(("x", "y", "z")):
            hits[c] += stats[2 * i] <= 31.5 <= stats[2 * i + 1]
    # 16 files over a 3-d z-curve: every dimension must skip files; a
    # linear sort would leave two dimensions at 16/16
    for c, h in hits.items():
        assert h < 16, (c, h)
    assert sum(hits.values()) <= 36  # and prune meaningfully overall


def test_write_sized_shards_hits_target_and_preserves_rows(spark, tmp_path, sf_smoke):
    import glob
    import os

    from etl_instagram_spark.operators.layout import write_sized_shards

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    total = docs.count()
    out = str(tmp_path / "shards")
    n = write_sized_shards(docs, out, target_mb=0.05, pilot_rows=100)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == n > 1
    # each shard within a generous factor of target (pilot calibration
    # + parquet per-file overhead make exact equality impossible)
    tgt = 0.05 * 1024 * 1024
    for f in files:
        assert os.path.getsize(f) < 4 * tgt, (f, os.path.getsize(f))
    back = spark.read.parquet(out)
    assert back.count() == total
    assert sorted(back.columns) == sorted(docs.columns)
    # a huge target collapses to one shard
    out1 = str(tmp_path / "one")
    assert write_sized_shards(docs, out1, target_mb=1024, pilot_rows=100) == 1
    assert len(glob.glob(f"{out1}/part-*.parquet")) == 1


def test_write_sized_shards_deterministic_shuffle_order(spark, tmp_path, sf_smoke):
    """With order_col set, shard contents are a pure function of the
    data (shuffle_key order), not of the input partitioning."""
    import glob

    from etl_instagram_spark.operators.layout import write_sized_shards

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )

    def shard_sets(out):
        return sorted(
            tuple(sorted(r["doc_id"] for r in spark.read.parquet(f).collect()))
            for f in glob.glob(f"{out}/part-*.parquet")
        )

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_sized_shards(docs.repartition(1), a, target_mb=0.05, order_col="doc_id")
    write_sized_shards(docs.repartition(13), b, target_mb=0.05, order_col="doc_id")
    assert shard_sets(a) == shard_sets(b)


def test_write_sized_shards_edge_cases(spark, tmp_path):
    import pytest as _pytest

    from etl_instagram_spark.operators.layout import write_sized_shards

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert write_sized_shards(empty, str(tmp_path / "e"), target_mb=1) == 1
    assert spark.read.parquet(str(tmp_path / "e")).count() == 0
    with _pytest.raises(ValueError):
        write_sized_shards(empty, str(tmp_path / "x"), target_mb=0)
