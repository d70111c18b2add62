"""Merge/upsert semantics (SURVEY §2.4 W1-W7, §5.4/5.6 fixtures)."""

from __future__ import annotations

import datetime as dt

import pytest

from etl_instagram_spark.operators import (
    MergeTable,
    anti_join_new,
    dedup_latest,
    delete_by_key,
    upsert,
    upsert_coalesce,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)
T2 = dt.datetime(2024, 1, 3)

COLS = ["id", "like_count", "updated_at"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, like_count long, updated_at timestamp")


@pytest.fixture()
def batch_a(spark):
    return _df(spark, [("p1", 10, T0), ("p2", 20, T0), ("p3", 30, T0)])


@pytest.fixture()
def batch_b(spark):
    # 1 new + 2 overlapping ids with changed like_count (FIXTURES.md §4)
    return _df(spark, [("p2", 21, T1), ("p3", 31, T1), ("p4", 40, T1)])


def test_upsert_latest_wins(spark, batch_a, batch_b):
    merged = upsert(batch_a, batch_b, "id")
    got = {r["id"]: r["like_count"] for r in merged.collect()}
    assert got == {"p1": 10, "p2": 21, "p3": 31, "p4": 40}


def test_upsert_idempotent(spark, batch_a, batch_b):
    once = upsert(batch_a, batch_b, "id")
    twice = upsert(once, batch_b, "id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_upsert_within_batch_latest_wins(spark, batch_a):
    dup = _df(spark, [("p9", 1, T0), ("p9", 2, T2), ("p9", 3, T1)])
    merged = upsert(batch_a, dup, "id")
    got = {r["id"]: r["like_count"] for r in merged.collect()}
    assert got["p9"] == 2  # T2 row wins
    assert merged.count() == 4


def test_dedup_latest(spark):
    dup = _df(spark, [("x", 1, T0), ("x", 2, T1), ("y", 5, T0)])
    out = dedup_latest(dup, "id")
    assert {r["id"]: r["like_count"] for r in out.collect()} == {"x": 2, "y": 5}


def test_anti_join_new(spark, batch_a, batch_b):
    fresh = anti_join_new(batch_b, batch_a, "id")
    assert [r["id"] for r in fresh.collect()] == ["p4"]


def test_delete_by_key(spark, batch_a):
    tomb = _df(spark, [("p2", None, None)])
    left = delete_by_key(batch_a, tomb, "id")
    assert sorted(r["id"] for r in left.collect()) == ["p1", "p3"]


def test_upsert_coalesce_partial_update(spark):
    # follower partial update: only profile fields present → old fields
    # preserved (extend-followers.js:126, FIXTURES.md §4)
    existing = spark.createDataFrame(
        [("f1", "alice", None, T0), ("f2", "bob", None, T0)],
        "id string, username string, biography string, updated_at timestamp",
    )
    batch = spark.createDataFrame(
        [("f1", None, "bio!", T1), ("f3", "carol", "hi", T1)],
        "id string, username string, biography string, updated_at timestamp",
    )
    out = upsert_coalesce(existing, batch, "id")
    got = {r["id"]: (r["username"], r["biography"]) for r in out.collect()}
    assert got == {
        "f1": ("alice", "bio!"),  # username preserved, biography filled
        "f2": ("bob", None),  # untouched
        "f3": ("carol", "hi"),  # inserted
    }


def test_upsert_schema_evolution(spark, batch_a):
    wider = spark.createDataFrame(
        [("p5", 50, T1, "new-col")],
        "id string, like_count long, updated_at timestamp, extra string",
    )
    merged = upsert(batch_a, wider, "id")
    assert merged.count() == 4
    assert "extra" in merged.columns
    assert merged.filter("id = 'p1'").first()["extra"] is None


def test_merge_table_atomic_roundtrip(spark, tmp_path, batch_a, batch_b):
    t = MergeTable(spark, str(tmp_path / "posts"), key="id")
    assert not t.exists()
    t.upsert(batch_a)
    t.upsert(batch_b)
    got = {r["id"]: r["like_count"] for r in t.read().collect()}
    assert got == {"p1": 10, "p2": 21, "p3": 31, "p4": 40}
    # idempotence across commits
    t.upsert(batch_b)
    assert t.read().count() == 4
    # tombstone delete
    t.delete(_df(spark, [("p1", None, None)]))
    assert sorted(r["id"] for r in t.read().collect()) == ["p2", "p3", "p4"]
    # snapshots accumulated; vacuum keeps current readable
    assert len(t.list_snapshots()) == 4
    t.vacuum(keep=1)
    assert t.read().count() == 3


def test_append_carries_files_by_reference(spark, tmp_path):
    """Scale contract: append must not rewrite existing data files."""
    import json as _json
    import os as _os

    t = MergeTable(spark, str(tmp_path / "t"), "id")
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    first_files = {e["path"] for e in _json.load(open(t.current_snapshot()))["files"]}
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    second_files = {e["path"] for e in _json.load(open(t.current_snapshot()))["files"]}
    assert first_files < second_files  # old files carried, new files added
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2]


def test_upsert_prunes_nonoverlapping_files(spark, tmp_path):
    """Key-range file skipping: an upsert touching high keys must carry
    the low-key files forward untouched."""
    import json as _json

    t = MergeTable(spark, str(tmp_path / "t"), "id", order_by="ts")
    t.append(spark.createDataFrame([(i, "old", 1) for i in range(0, 10)], "id long, v string, ts long"))
    t.append(spark.createDataFrame([(i, "old", 1) for i in range(1000, 1010)], "id long, v string, ts long"))
    before = {e["path"] for e in _json.load(open(t.current_snapshot()))["files"]}

    t.upsert(spark.createDataFrame([(1005, "new", 2)], "id long, v string, ts long"))
    after = {e["path"] for e in _json.load(open(t.current_snapshot()))["files"]}

    # low-key file(s) carried by reference; at least one high-key file replaced
    assert any(p in after for p in before)
    assert any(p not in after for p in before)
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[1005] == "new" and got[5] == "old" and len(got) == 20


def test_upsert_scattered_keys_rewrites_only_hit_files(spark, tmp_path):
    """The envelope-pruning regression: a batch whose keys sit at opposite
    ends of the table spans the whole [min,max] envelope but touches only
    a few files — the per-file containment probe must carry every file
    that contains none of the batch's keys."""
    import json as _json

    t = MergeTable(spark, str(tmp_path / "t"), "id", order_by="ts")
    for k in range(10):  # 10 disjoint-range commits => >= 10 data files
        t.append(
            spark.createDataFrame(
                [(k * 100 + i, "old", 1) for i in range(10)], "id long, v string, ts long"
            )
        )
    manifest = _json.load(open(t.current_snapshot()))["files"]
    assert len(manifest) >= 10
    before = {e["path"] for e in manifest}
    # files whose stats range contains either scattered key
    hit = {
        e["path"]
        for e in manifest
        if any(e["min_key"]["v"] <= k <= e["max_key"]["v"] for k in (5, 905))
    }
    assert 1 <= len(hit) <= 2

    t.upsert(spark.createDataFrame([(5, "new", 2), (905, "new", 2)], "id long, v string, ts long"))
    after = {e["path"] for e in _json.load(open(t.current_snapshot()))["files"]}

    rewritten = before - after
    assert rewritten == hit  # ONLY the containing files rewrote
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[5] == "new" and got[905] == "new" and got[6] == "old"
    assert len(got) == 100


def test_read_overlapping_prunes_to_hit_files(spark, tmp_path):
    """The read-side probe: a key-equality lookup reads only the files
    whose stats range can contain a probed key, and the returned subset
    is sufficient for the existence anti-join (every probed key that
    exists anywhere is in it)."""
    t = MergeTable(spark, str(tmp_path / "t"), "id", order_by="ts")
    for k in range(10):  # 10 disjoint-range commits => >= 10 data files
        t.append(
            spark.createDataFrame(
                [(k * 100 + i, "old", 1) for i in range(10)], "id long, v string, ts long"
            )
        )
    keys = spark.createDataFrame([(5,), (905,), (99999,)], "id long")
    subset = t.read_overlapping(keys)
    # pruned: far fewer rows than the table, but both present keys found
    assert subset.count() <= 20 < t.read().count()
    found = {r["id"] for r in subset.filter("id IN (5, 905, 99999)").collect()}
    assert found == {5, 905}
    # zero-hit probe: empty frame, table schema intact
    missed = t.read_overlapping(spark.createDataFrame([(55555,)], "id long"))
    assert missed.count() == 0
    assert missed.columns == t.read().columns


def test_vacuum_garbage_collects_unreferenced_files(spark, tmp_path):
    import os as _os

    t = MergeTable(spark, str(tmp_path / "t"), "id", order_by="v")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t.upsert(df)
    t.upsert(spark.createDataFrame([(1, "b")], "id long, v string"))
    t.upsert(spark.createDataFrame([(1, "c")], "id long, v string"))
    assert len(t.list_snapshots()) == 3
    t.vacuum(keep=1)
    assert len(t.list_snapshots()) == 1
    assert t.read().collect()[0]["v"] == "c"
    # all remaining parquet files are referenced by the surviving manifest
    import json as _json

    referenced = {e["path"] for e in _json.load(open(t.current_snapshot()))["files"]}
    on_disk = set()
    data_dir = _os.path.join(str(tmp_path / "t"), "data")
    for commit in _os.listdir(data_dir):
        for name in _os.listdir(_os.path.join(data_dir, commit)):
            if name.endswith(".parquet"):
                on_disk.add(_os.path.join("data", commit, name))
    assert on_disk == referenced


def test_time_travel_read(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"), "id", order_by="v")
    t.upsert(spark.createDataFrame([(1, "a")], "id long, v string"))
    snap1 = t.list_snapshots()[-1]
    t.upsert(spark.createDataFrame([(1, "b"), (2, "c")], "id long, v string"))
    assert sorted(r["v"] for r in t.read().collect()) == ["b", "c"]
    assert [r["v"] for r in t.read(snapshot=snap1).collect()] == ["a"]  # time travel


def test_commit_failure_leaves_previous_snapshot_intact(spark, tmp_path, monkeypatch):
    """Atomicity: a crash after data-file write but before the pointer
    swap must leave readers on the previous snapshot."""
    t = MergeTable(spark, str(tmp_path / "t"), "id", order_by="v")
    t.upsert(spark.createDataFrame([(1, "a")], "id long, v string"))

    import etl_instagram_spark.operators.merge as merge_mod

    real_replace = merge_mod.os.replace

    def exploding_replace(src, dst):
        if dst.endswith("_CURRENT"):
            raise OSError("simulated crash before pointer swap")
        return real_replace(src, dst)

    monkeypatch.setattr(merge_mod.os, "replace", exploding_replace)
    with pytest.raises(OSError):
        t.upsert(spark.createDataFrame([(1, "b")], "id long, v string"))
    monkeypatch.undo()

    # reader still sees the old committed state
    assert [r["v"] for r in t.read().collect()] == ["a"]
    # and a retry succeeds cleanly
    t.upsert(spark.createDataFrame([(1, "b")], "id long, v string"))
    assert [r["v"] for r in t.read().collect()] == ["b"]


def test_upsert_schema_evolution_both_directions(spark, tmp_path):
    """Mongoose documents are schemaless (models.js adds fields over
    releases), so the table must absorb batches that ADD a column (old
    rows read back null there) and batches that OMIT one (existing
    values survive; new rows get null) — upsert-time unionByName with
    allowMissingColumns, pinned here so a merge-path rewrite can't
    regress it."""
    t = MergeTable(spark, str(tmp_path / "evolve"), "id")
    t.upsert(spark.createDataFrame(
        [("a", 1, "2021-01-01")], "id string, v long, updated_at string"))
    t.upsert(spark.createDataFrame(
        [("b", 2, "x", "2021-01-02")],
        "id string, v long, extra string, updated_at string"))
    t.upsert(spark.createDataFrame(
        [("c", 3, "2021-01-03")], "id string, v long, updated_at string"))
    got = {r["id"]: (r["v"], r["extra"]) for r in t.read().collect()}
    assert got == {"a": (1, None), "b": (2, "x"), "c": (3, None)}


def test_key_stats_ignore_same_named_nested_leaf(spark, tmp_path):
    """Parquet footer stats must come from the TOP-LEVEL key column, not
    a nested leaf sharing its name (user.id in the posts table): a
    name-keyed leaf lookup let the nested column shadow the key, so file
    ranges were built from the WRONG values — at best None (null leaf,
    conservative full scan), at worst a range that misses the real keys,
    so an overlap probe skips a file holding an existing key and the
    upsert duplicates it."""
    t = MergeTable(spark, str(tmp_path / "shadow"), "id")
    t.upsert(
        spark.createDataFrame(
            [("1", ("u-a",)), ("2", ("u-b",))], "id string, user struct<id string>"
        )
    )
    files = t._manifest_files()
    # stats exist and reflect the top-level ids, not the u-* leaf values
    assert all(f["min_key"]["v"] is not None for f in files)
    assert all(f["max_key"]["v"] <= "2" for f in files)
    # a disjoint probe prunes every file (the wrong-range symptom was
    # either no pruning at all, or pruning against u-* ranges)
    probe = spark.createDataFrame([("9",)], "id string")
    overlapping, carried = t._split_overlap(probe)
    assert not overlapping and len(carried) == len(files)
    # re-upserting an existing key must rewrite its file, not duplicate
    t.upsert(
        spark.createDataFrame([("1", ("u-z",))], "id string, user struct<id string>")
    )
    rows = {r["id"]: r["user"]["id"] for r in t.read().collect()}
    assert rows == {"1": "u-z", "2": "u-b"}


def test_diff_insert_update_delete_between_snapshots(spark, tmp_path):
    """CDC semantics: an upsert + delete between two snapshots yields
    exactly the inserted/updated/deleted rows, unchanged rows absent,
    deleted rows carrying their old values."""
    from pyspark.sql import functions as F

    t = MergeTable(spark, str(tmp_path / "t"), "id", order_by="ts")
    t0 = dt.datetime(2024, 1, 1)
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", t0), (2, "b", t0), (3, "c", t0)], "id long, v string, ts timestamp"
        )
    )
    snap_a = t.list_snapshots()[-1]
    t.upsert(
        spark.createDataFrame(
            [(2, "B", dt.datetime(2024, 1, 2)), (4, "d", dt.datetime(2024, 1, 2))],
            "id long, v string, ts timestamp",
        )
    )
    t.delete(spark.createDataFrame([(3,)], "id long"))
    got = {
        r["id"]: (r["_change"], r["v"])
        for r in t.diff(snap_a).collect()
    }
    # row 1 is unchanged and must be ABSENT; the rest classify exactly
    assert got == {
        2: ("update", "B"),
        3: ("delete", "c"),
        4: ("insert", "d"),
    }
    # diff against an explicit until: comparing snap_a with itself is empty
    assert t.diff(snap_a, snap_a).count() == 0
    # the timestamp column does count as change: upsert stamps rode ts
    assert (
        t.diff(snap_a).filter(F.col("_change") == "update").count() == 1
    )


def test_diff_requires_shared_key(spark, tmp_path):
    t = MergeTable(spark, str(tmp_path / "t"), "id")
    t.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    snap_a = t.list_snapshots()[-1]
    # a later snapshot that (pathologically) dropped the key column
    t.overwrite(spark.createDataFrame([("x",)], "v string"))
    with pytest.raises(ValueError, match="share the table key"):
        t.diff(snap_a)


def test_upsert_assume_pinned_matches_default(spark, tmp_path, batch_a, batch_b):
    """assume_pinned skips the internal re-evaluation checkpoint; with a
    caller-pinned batch the merge result is identical to the default
    path (same rows, same latest-wins outcome, still idempotent)."""
    t_def = MergeTable(spark, str(tmp_path / "def"), "id", order_by="updated_at")
    t_pin = MergeTable(spark, str(tmp_path / "pin"), "id", order_by="updated_at")
    t_def.upsert(batch_a)
    t_pin.upsert(batch_a)
    pinned = batch_b.localCheckpoint(eager=True)
    t_def.upsert(batch_b)
    t_pin.upsert(pinned, assume_pinned=True)
    want = sorted(map(tuple, t_def.read().select(*COLS).collect()))
    got = sorted(map(tuple, t_pin.read().select(*COLS).collect()))
    assert got == want
    # replay converges (idempotence holds on the pinned path too)
    t_pin.upsert(pinned, assume_pinned=True)
    assert sorted(map(tuple, t_pin.read().select(*COLS).collect())) == want
