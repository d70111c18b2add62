"""Independent-engine certification of the continuous-aggregate surface.

test_streaming.py proves the continuous rollup equals the ENGINE'S OWN
batch hypertable_rollup and survives replay/compaction; like the CDC
surface before round 7, its values had never been checked against
another engine. Here DuckDB simulates the same epoch loop — its own
partials state table, per-epoch keyed upsert (including an identical
epoch replay), the same compaction rewrite — over batches derived from
the real events table, and both the maintained partials STATE and the
final multi-grain READ must match the simulation value-for-value (sums
compared on a 6dp grid: the two engines legitimately sum doubles in
different orders).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from etl_instagram_spark.operators.merge import MergeTable
from etl_instagram_spark.streaming.incremental import (
    apply_rollup_delta,
    compact_rollup_partials,
    continuous_rollup_read,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
N_EPOCHS = 4
REPLAYED_EPOCH = 1
COMPACT_THROUGH = 2


def _epoch_batches() -> list[pd.DataFrame]:
    """Deterministic epoch batches covering every event exactly once:
    epoch = event_id % N_EPOCHS."""
    con = duckdb.connect()
    df = con.sql(
        f"""
        SELECT event_id % {N_EPOCHS} AS epoch, ts, event_type, value
        FROM '{EVENTS}' ORDER BY event_id
        """
    ).df()
    con.close()
    return [
        df[df["epoch"] == e].drop(columns=["epoch"]).reset_index(drop=True)
        for e in range(N_EPOCHS)
    ]


def _canon_partials(rows) -> dict[tuple, tuple]:
    return {
        (int(e), str(pd.Timestamp(b)), t): (int(rc), round(float(sv), 6))
        for e, b, t, rc, sv in rows
    }


def test_continuous_rollup_matches_duckdb_epoch_simulation(spark, tmp_path):
    batches = _epoch_batches()

    # --- DuckDB simulation: own partials state + upsert/replay/compact ---
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE partials (epoch_id INT, bucket TIMESTAMP, "
        "event_type VARCHAR, rc BIGINT, sum_value DOUBLE)"
    )

    def duck_apply(e: int, batch: pd.DataFrame) -> None:
        con.register("batch", batch)
        # keyed upsert: the replayed epoch replaces itself, never adds
        con.sql(
            "DELETE FROM partials WHERE epoch_id = ? AND EXISTS ("
            "  SELECT 1 FROM batch b"
            "  WHERE date_trunc('hour', b.ts) = partials.bucket"
            "    AND b.event_type = partials.event_type)",
            params=[e],
        )
        con.sql(
            "INSERT INTO partials "
            "SELECT ?, date_trunc('hour', ts), event_type, count(*), sum(value) "
            "FROM batch GROUP BY 2, 3",
            params=[e],
        )

    schedule = list(enumerate(batches))
    schedule.insert(REPLAYED_EPOCH + 1, (REPLAYED_EPOCH, batches[REPLAYED_EPOCH]))
    for e, batch in schedule:
        duck_apply(e, batch)
    # compaction: collapse epochs <= COMPACT_THROUGH into one row per group
    con.sql(
        f"""
        CREATE TABLE compacted AS
        SELECT {COMPACT_THROUGH} AS epoch_id, bucket, event_type,
               sum(rc) AS rc, sum(sum_value) AS sum_value
        FROM partials WHERE epoch_id <= {COMPACT_THROUGH}
        GROUP BY bucket, event_type
        """
    )
    con.sql(f"DELETE FROM partials WHERE epoch_id <= {COMPACT_THROUGH}")
    con.sql("INSERT INTO partials SELECT * FROM compacted")
    want_state = _canon_partials(con.sql("SELECT * FROM partials").fetchall())
    want_read = {
        (g, str(pd.Timestamp(b)), t): (int(n), round(float(sv), 6))
        for g, b, t, n, sv in con.sql(
            """
            WITH g AS (SELECT unnest(['hour', 'day', 'week']) AS grain)
            SELECT grain, date_trunc(grain, bucket) AS gb, event_type,
                   sum(rc), sum(sum_value)
            FROM partials CROSS JOIN g
            GROUP BY 1, 2, 3
            """
        ).fetchall()
    }
    con.close()

    # --- engine: the real delta/replay/compaction path, same schedule ---
    partials = MergeTable(
        spark, str(tmp_path / "p"), ["epoch_id", "bucket", "event_type"]
    )
    for e, batch in schedule:
        apply_rollup_delta(partials, spark.createDataFrame(batch), e)
    compact_rollup_partials(partials, COMPACT_THROUGH)

    got_state = _canon_partials(
        (r["epoch_id"], r["bucket"], r["event_type"], r["__rc"], r["__sum_value"])
        for r in partials.read().collect()
    )
    assert got_state == want_state

    got_read = {
        (r["grain"], str(pd.Timestamp(r["bucket"])), r["event_type"]): (
            int(r["n_rows"]),
            round(float(r["sum_value"]), 6),
        )
        for r in continuous_rollup_read(
            partials, ["hour", "day", "week"]
        ).collect()
    }
    assert got_read == want_read
