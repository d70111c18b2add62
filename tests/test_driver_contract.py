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


def _driver_fingerprint(columns, rows):
    """The driver's order-insensitive value hash (tools/oracle_check.py
    frame_fingerprint), inlined: columns sorted by name, floats
    canonicalized to 12 significant digits, rows sorted."""
    import hashlib
    import math

    def canon(v):
        if v is None:
            return "<NULL>"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.12g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return (
        len(rows),
        [columns[i] for i in order],
        hashlib.sha256("\x1e".join(canon_rows).encode()).hexdigest()[:16],
    )


def test_gate_hash_stable_across_partitioning(spark, sf_smoke):
    """Rounds 5 and 6 each shipped exactly one gate red, and both were the
    same bug class: a result that depends on partitioning (HUGEINT cast
    surfacing through a different plan; a summation-order rounding tie at
    0.98195). Pin the class: every registered query must produce the
    IDENTICAL driver-style value hash under two adversarially different
    physical layouts — (shuffle=1, whole-file scan splits, AQE on) vs
    (shuffle=32, 32 KiB scan splits, AQE off). Any stat whose value
    drifts with float summation order fails here before the driver sees
    it."""
    layouts = [
        {"spark.sql.shuffle.partitions": "1",
         "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
         "spark.sql.adaptive.enabled": "true"},
        {"spark.sql.shuffle.partitions": "32",
         "spark.sql.files.maxPartitionBytes": str(32 * 1024),
         "spark.sql.adaptive.enabled": "false"},
    ]
    saved = {k: spark.conf.get(k) for k in layouts[0]}
    mismatches = []
    try:
        for name, fn in entry_mod.queries().items():
            prints = []
            for layout in layouts:
                for k, v in layout.items():
                    spark.conf.set(k, v)
                df = fn(spark, sf_smoke)
                prints.append(_driver_fingerprint(df.columns, [tuple(r) for r in df.collect()]))
            if prints[0] != prints[1]:
                mismatches.append((name, prints[0], prints[1]))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert not mismatches, mismatches


def test_gate_outputs_are_scalar_only(spark, sf_smoke):
    """The driver's pandas canonicalization sorts result frames with
    ``sort_values`` over all columns; an array/map/struct-typed output
    column crashes it (``TypeError: unhashable type: 'list'``) before
    any comparison runs — the sole red row of CORRECTNESS_r16
    (``graph_walk_embeddings`` returned ``emb array<float>``). Pin the
    class at the SCHEMA level, no execution needed: every registered
    gate query must emit only atomic top-level column types.
    Vector-valued results posexplode into (…, d, value) scalar rows."""
    from pyspark.sql import types as T

    offenders = []
    for name, fn in entry_mod.queries().items():
        for field in fn(spark, sf_smoke).schema.fields:
            if isinstance(
                field.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                offenders.append((name, field.name, str(field.dataType)))
    assert not offenders, offenders


def test_replica_rejects_nonscalar_outputs():
    """tools/oracle_check.py must be at least as strict as the driver:
    its r16 ``canon()`` stringified list cells and so PASSED the exact
    row the driver errored on. Regression-pin with the pre-fix r16
    output shape — a frame carrying an array<float> ``emb`` column."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from oracle_check import nonscalar_columns

    prefix_r16_shape = [
        (2, 1.25, [0.1, 0.2]),
        (4, 0.75, [0.3, 0.4]),
    ]
    assert nonscalar_columns(["node", "norm", "emb"], prefix_r16_shape) == [
        "emb"
    ]
    scalar_rows = [(2, 1.25, 0, 0.1), (2, 1.25, 1, 0.2)]
    assert nonscalar_columns(["node", "norm", "d", "value"], scalar_rows) == []


def test_entry_smokes(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_bench_sf_parser():
    import bench

    assert bench.sf_from_dir("/root/testdata/sf0.1") == pytest.approx(0.1)
    assert bench.sf_from_dir("/x/sf0.001/") == pytest.approx(0.001)
    assert bench.sf_from_dir("/weird/dir") == -1.0
