"""Guards on the driver contract (__spark_entry__): every query has an
oracle with IDENTICAL column aliases (the driver hash-compares sorted-by-
name columns, so alias drift silently fails the gate), entry() smokes,
and bench's output helper parses scale factors."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# every registered query is oracle-gated: the last rows-only entry
# (emb_ann_ivf_recall) gained a generated centroid-literal oracle, so
# this set should stay empty — add to it only with a documented reason
ROWS_ONLY: set[str] = set()


def test_queries_and_oracles_pair_up():
    qs, oq = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oq) <= set(qs)
    # every query is oracle-gated except the documented rows-only set
    assert set(qs) - set(oq) == ROWS_ONLY
    # the driver's CORRECTNESS file caps at 50 rows — stay at exactly 50
    # so every registered query gets a driver-side row
    assert len(qs) == 50


def test_column_aliases_match_oracle(spark, sf_smoke):
    """Spark schema (no execution) vs DuckDB result columns, per query."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke}/{t}.parquet'")
    mismatches = []
    for name, fn in entry_mod.queries().items():
        if name in ROWS_ONLY:
            continue
        spark_cols = sorted(fn(spark, sf_smoke).columns)
        duck_cols = sorted(con.sql(entry_mod.oracle_sql()[name]).columns)
        if spark_cols != duck_cols:
            mismatches.append((name, spark_cols, duck_cols))
    assert not mismatches, mismatches


def test_result_value_types_match_oracle(spark, sf_smoke):
    """The driver's value-hash distinguishes Python 16905 from 16905.0:
    DuckDB's sum(BIGINT) returns HUGEINT (read back as float), so an
    oracle that sums an integer column bare fails hash_match even when
    every value is numerically identical (the round-5 regression on the
    split/mixture/boilerplate rows). Pin the contract locally: for every
    oracle-gated query, the Python value types of each column must agree
    between the Spark result and the DuckDB result at sf0.001."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke}/{t}.parquet'")
    mismatches = []
    oq = entry_mod.oracle_sql()
    for name, fn in entry_mod.queries().items():
        if name in ROWS_ONLY:
            continue
        sdf = fn(spark, sf_smoke)
        s_types = {c: set() for c in sdf.columns}
        for row in sdf.collect():
            for c in sdf.columns:
                v = row[c]
                if v is not None:
                    s_types[c].add(type(v).__name__)
        ddf = con.sql(oq[name])
        d_types = {c: set() for c in ddf.columns}
        for row in ddf.fetchall():
            for c, v in zip(ddf.columns, row):
                if v is not None:
                    d_types[c].add(type(v).__name__)
        for c in s_types:
            # only flag columns where BOTH engines produced values and
            # the observed type sets differ — an empty sf0.001 result
            # can't certify, but also can't false-alarm
            if s_types[c] and d_types.get(c) and s_types[c] != d_types[c]:
                mismatches.append((name, c, s_types[c], d_types[c]))
    assert not mismatches, mismatches


def test_entry_smokes(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_bench_sf_parser():
    import bench

    assert bench.sf_from_dir("/root/testdata/sf0.1") == pytest.approx(0.1)
    assert bench.sf_from_dir("/x/sf0.001/") == pytest.approx(0.001)
    assert bench.sf_from_dir("/weird/dir") == -1.0
