"""Property-based tests (hypothesis) for the upsert operator's core
invariants (SURVEY §5.4): key uniqueness, idempotence, latest-wins —
over generated key-overlapping batches, including timestamp ties."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_instagram_spark.operators.merge import dedup_latest, upsert

# small key space forces collisions; small ts range forces ties
row = st.tuples(st.integers(0, 4), st.integers(0, 2), st.integers(0, 9))
batch = st.lists(row, min_size=1, max_size=8)

SCHEMA = "id long, ts long, payload long"


def df_of(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows], SCHEMA)


@settings(
    deadline=None,
    max_examples=12,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(existing=batch, incoming=batch)
def test_upsert_invariants(spark, existing, incoming):
    e = dedup_latest(df_of(spark, existing), "id", "ts")  # table state is unique
    i = df_of(spark, incoming)
    merged = upsert(e, i, "id", "ts").collect()

    # 1. key uniqueness
    ids = [r["id"] for r in merged]
    assert len(ids) == len(set(ids))

    # 2. all keys present (existing ∪ incoming)
    expect_keys = {r[0] for r in existing} | {r[0] for r in incoming}
    assert set(ids) == expect_keys

    # 3. latest-wins: for keys in the incoming batch, the winner carries
    # the batch's max ts for that key
    by_id = {r["id"]: r for r in merged}
    for k in {r[0] for r in incoming}:
        max_ts = max(ts for (kk, ts, _) in incoming if kk == k)
        assert by_id[k]["ts"] == max_ts

    # 4. idempotence: applying the same batch again changes nothing
    again = upsert(upsert(e, i, "id", "ts"), i, "id", "ts").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, merged))
