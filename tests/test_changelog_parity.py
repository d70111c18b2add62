"""Independent-engine certification of the CDC surface.

The streaming family's exactly-once behavior is replay-tested in
test_streaming.py, but until this file its insert/update/delete
CLASSIFICATION was only checked against hand-written expectations.
Here DuckDB simulates the same epoch loop of keyed upserts in plain SQL
(its own state table, its own per-epoch classification) over batches
derived from the orders table, and the engine's changelog must match
the simulation change-for-change — the same independent-oracle standard
the batch query surface gets.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from etl_instagram_spark.operators.merge import MergeTable, table_changes
from etl_instagram_spark.streaming.incremental import apply_changelog_batch

ORDERS = "/root/testdata/sf0.001/orders.parquet"
N_EPOCHS = 5


def _epoch_batches() -> list[pd.DataFrame]:
    """Deterministic epoch batches from the orders table: key = custkey
    mod 40 (collisions across epochs → updates), one row per key per
    epoch (deduped by a fully-ordered SQL window so BOTH engines receive
    identical batches), plus identical re-deliveries of previously-seen
    images for keys ≡ 0 (mod 3) — the at-least-once case that must NOT
    appear in the changelog."""
    con = duckdb.connect()
    new_rows = con.sql(
        f"""
        WITH src AS (
          SELECT o_orderkey, o_custkey % 40 AS id, o_orderkey % {N_EPOCHS} AS epoch,
                 o_totalprice AS total, o_orderstatus AS status,
                 CAST(o_orderdate AS TIMESTAMP) AS updated_at
          FROM '{ORDERS}'),
        d AS (
          SELECT *, row_number() OVER (
            PARTITION BY epoch, id
            ORDER BY updated_at DESC, total DESC, o_orderkey DESC) AS rn
          FROM src)
        SELECT epoch, id, total, status, updated_at FROM d WHERE rn = 1
        ORDER BY epoch, id
        """
    ).df()
    con.close()
    batches: list[pd.DataFrame] = []
    state: dict[int, tuple] = {}
    for e in range(N_EPOCHS):
        cur = new_rows[new_rows["epoch"] == e].drop(columns=["epoch"])
        batch = {int(r.id): (r.total, r.status, r.updated_at) for r in cur.itertuples()}
        for k, img in state.items():
            if k % 3 == 0 and k not in batch:
                batch[k] = img  # identical re-delivery
        batches.append(
            pd.DataFrame(
                [(k, *batch[k]) for k in sorted(batch)],
                columns=["id", "total", "status", "updated_at"],
            )
        )
        state.update(
            {int(r.id): (r.total, r.status, r.updated_at) for r in cur.itertuples()}
        )
    return batches


def _canon(rows) -> set[tuple]:
    return {
        (int(e), int(i), c, round(float(t), 2), s, str(pd.Timestamp(u)))
        for e, i, c, t, s, u in rows
    }


def test_changelog_classification_matches_duckdb_epoch_simulation(spark, tmp_path):
    batches = _epoch_batches()

    # --- DuckDB simulation: its own state table + per-epoch classify ---
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE state (id BIGINT, total DOUBLE, status VARCHAR, "
        "updated_at TIMESTAMP)"
    )
    expected: set[tuple] = set()
    for e, batch in enumerate(batches):
        con.register("batch", batch)
        expected |= _canon(
            con.sql(
                """
                SELECT ?::INT AS epoch, b.id, 'insert' AS change,
                       b.total, b.status, b.updated_at
                FROM batch b ANTI JOIN state s USING (id)
                UNION ALL
                SELECT ?::INT, b.id, 'update', b.total, b.status, b.updated_at
                FROM batch b JOIN state s USING (id)
                WHERE (b.total IS DISTINCT FROM s.total)
                   OR (b.status IS DISTINCT FROM s.status)
                   OR (b.updated_at IS DISTINCT FROM s.updated_at)
                """,
                params=[e, e],
            ).fetchall()
        )
        # upsert: batch rows replace same-key state rows
        con.sql("DELETE FROM state WHERE id IN (SELECT id FROM batch)")
        con.sql("INSERT INTO state SELECT * FROM batch")
    final_state = {
        int(r[0]): (round(float(r[1]), 2), r[2], str(pd.Timestamp(r[3])))
        for r in con.sql("SELECT * FROM state").fetchall()
    }
    con.close()

    # --- engine: the real changelog loop over the same batches ---
    table = MergeTable(spark, str(tmp_path / "t"), "id")
    changes = MergeTable(spark, str(tmp_path / "c"), ["epoch", "id"])
    for e, batch in enumerate(batches):
        sdf = spark.createDataFrame(batch)
        apply_changelog_batch(table, changes, sdf, e)

    got = _canon(
        (r["epoch"], r["id"], r["_change"], r["total"], r["status"], r["updated_at"])
        for r in changes.read().collect()
    )
    assert got == expected
    got_state = {
        int(r["id"]): (round(float(r["total"]), 2), r["status"], str(pd.Timestamp(r["updated_at"])))
        for r in table.read().collect()
    }
    assert got_state == final_state


def test_table_changes_three_way_classification_matches_duckdb(spark):
    """table_changes (the diff core under MergeTable.diff AND the
    changelog) vs a DuckDB full-outer classification — including the
    DELETE class the upsert-only streaming surface never emits."""
    con = duckdb.connect()
    old_pdf = con.sql(
        f"""
        SELECT o_orderkey % 60 AS id,
               max(o_totalprice) AS total, max(o_orderstatus) AS status
        FROM '{ORDERS}' WHERE o_orderkey % 60 < 45
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    new_pdf = con.sql(
        f"""
        SELECT o_orderkey % 60 AS id,
               CASE WHEN o_orderkey % 60 % 4 = 0
                    THEN max(o_totalprice) + 1.0
                    ELSE max(o_totalprice) END AS total,
               max(o_orderstatus) AS status
        FROM '{ORDERS}' WHERE o_orderkey % 60 >= 15
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    con.register("old", old_pdf)
    con.register("new", new_pdf)
    expected = {
        (int(i), c)
        for i, c in con.sql(
            """
            SELECT coalesce(o.id, n.id) AS id,
                   CASE WHEN o.id IS NULL THEN 'insert'
                        WHEN n.id IS NULL THEN 'delete'
                        WHEN (o.total IS DISTINCT FROM n.total)
                          OR (o.status IS DISTINCT FROM n.status) THEN 'update'
                   END AS change
            FROM old o FULL OUTER JOIN new n USING (id)
            WHERE change IS NOT NULL
            """
        ).fetchall()
    }
    con.close()
    got = {
        (int(r["id"]), r["_change"])
        for r in table_changes(
            spark.createDataFrame(old_pdf), spark.createDataFrame(new_pdf), "id"
        ).collect()
    }
    assert got == expected
