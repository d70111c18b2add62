"""End-to-end golden test for the hashtag pipeline (SURVEY §3.1) including
incremental semantics across two batches and timestamp maintenance."""

from __future__ import annotations

from datetime import datetime, timezone

from etl_instagram_spark.operators.merge import MergeTable
from etl_instagram_spark.pipelines.hashtags import run_hashtag_batch
from etl_instagram_spark.sources import schemas as S
from tests.test_ingest import detail, gql_node, graphql_page, loc_detail, parse, sec_media, sections_page

T1 = datetime(2021, 1, 1, tzinfo=timezone.utc)
T2 = datetime(2021, 1, 2, tzinfo=timezone.utc)


def tables(spark, tmp_path):
    return (
        MergeTable(spark, str(tmp_path / "posts"), "id"),
        MergeTable(spark, str(tmp_path / "users"), "id"),
        MergeTable(spark, str(tmp_path / "locations"), "id"),
    )


def test_hashtag_pipeline_end_to_end(spark, tmp_path):
    posts_t, users_t, locations_t = tables(spark, tmp_path)

    raw_gql = parse(
        spark,
        [graphql_page("food", [gql_node("1", "AAA", 10, "hi #food"), gql_node("2", "BBB", 20, "yo")])],
        S.RAW_TAG_PAGE_GRAPHQL,
    )
    raw_sec = parse(
        spark, [sections_page("food", [sec_media("3", "CCC", 30, True, False)])], S.RAW_TAG_PAGE_SECTIONS
    )
    details = parse(
        spark,
        [detail("AAA", "alice", "L1"), detail("BBB", "spammer"), detail("CCC", "carol")],
        S.RAW_POST_DETAIL,
    )
    locs = parse(spark, [loc_detail("L1", "graphql")], S.RAW_LOCATION_DETAIL)

    stats = run_hashtag_batch(
        spark, raw_gql, raw_sec, details, locs,
        posts_t, users_t, locations_t,
        blocklist=["spammer"], batch_ts=T1,
    )
    assert stats == {"new_posts": 3, "kept_posts": 2}  # spammer dropped

    posts = {r["id"]: r for r in posts_t.read().collect()}
    assert set(posts) == {"1", "3"}
    assert posts["1"]["user"]["username"] == "alice"
    assert posts["1"]["location"]["id"] == "L1"
    assert posts["1"]["location"]["gps"]["coordinates"] == [-99.1, 19.4]
    assert posts["3"]["location"] is None
    assert posts["1"]["created_at"] == posts["1"]["updated_at"]
    assert posts["1"]["labels"] is None and posts["1"]["topics"] is None

    users = {r["id"]: r for r in users_t.read().collect()}
    assert set(users) == {"u-alice", "u-carol"}

    locations = [r["id"] for r in locations_t.read().collect()]
    assert locations == ["L1"]


def test_hashtag_pipeline_incremental_second_batch(spark, tmp_path):
    posts_t, users_t, locations_t = tables(spark, tmp_path)
    raw1 = parse(
        spark, [graphql_page("food", [gql_node("1", "AAA", 10, "hi")])], S.RAW_TAG_PAGE_GRAPHQL
    )
    d1 = parse(spark, [detail("AAA", "alice", None)], S.RAW_POST_DETAIL)
    run_hashtag_batch(spark, raw1, None, d1, None, posts_t, users_t, locations_t, batch_ts=T1)

    # batch 2: post 1 again (should be skipped by J3) + new post 9
    raw2 = parse(
        spark,
        [graphql_page("food", [gql_node("1", "AAA", 999, "changed"), gql_node("9", "ZZZ", 5, "new")])],
        S.RAW_TAG_PAGE_GRAPHQL,
    )
    d2 = parse(spark, [detail("AAA", "alice", None), detail("ZZZ", "zed", None)], S.RAW_POST_DETAIL)
    stats = run_hashtag_batch(spark, raw2, None, d2, None, posts_t, users_t, locations_t, batch_ts=T2)
    assert stats["new_posts"] == 1  # only post 9 is new

    posts = {r["id"]: r for r in posts_t.read().collect()}
    assert set(posts) == {"1", "9"}
    assert posts["1"]["like_count"] == 10  # existence-check semantics: not re-ingested
    assert posts["1"]["created_at"].date().isoformat() == "2021-01-01"
    assert posts["9"]["created_at"].date().isoformat() == "2021-01-02"

    # post 1 was skipped by the existence check, so alice's user row is
    # untouched (reference semantics: only new posts upsert their author);
    # zed arrives with batch-2 timestamps
    users = {r["id"]: r for r in users_t.read().collect()}
    assert users["u-alice"]["updated_at"].date().isoformat() == "2021-01-01"
    assert users["u-zed"]["created_at"].date().isoformat() == "2021-01-02"


def test_second_batch_reads_only_overlapping_files(spark, tmp_path, monkeypatch):
    """The O(batch)-not-O(table) claim, pinned: a later tick's existence
    anti-join must read ONLY the table files whose key range can contain
    a batch id. Ingest two disjoint key ranges (a*, b*), then probe with
    a fully disjoint batch (c*) — zero files may be read — and with a
    batch overlapping only the b-range — at least one file must be
    SKIPPED. If a tick ever rescans non-overlapping files, the skip
    counts here go to zero and this test fails."""
    posts_t, users_t, locations_t = tables(spark, tmp_path)

    probes: list[tuple[int, int]] = []
    orig_split = MergeTable._split_overlap

    def spy_read_overlapping(self, keys):
        overlapping, carried = orig_split(self, keys)
        if self.path == posts_t.path:
            probes.append((len(overlapping), len(carried)))
        if not overlapping:
            return self.read().limit(0)
        return self._read_files(overlapping)

    monkeypatch.setattr(MergeTable, "read_overlapping", spy_read_overlapping)

    def batch(ids):
        raw = parse(
            spark,
            [graphql_page("food", [gql_node(i, "AAA", 1, "hi") for i in ids])],
            S.RAW_TAG_PAGE_GRAPHQL,
        )
        d = parse(spark, [detail("AAA", "alice", None)], S.RAW_POST_DETAIL)
        return run_hashtag_batch(
            spark, raw, None, d, None, posts_t, users_t, locations_t, batch_ts=T1
        )

    batch(["a0", "a1", "a2"])  # no probe: table doesn't exist yet
    batch(["b0", "b1", "b2"])  # b* disjoint from a* -> probe reads 0 files
    assert probes[-1][0] == 0 and probes[-1][1] > 0, probes

    n_files_before = probes[-1][1] + probes[-1][0]
    stats = batch(["c0", "c1"])  # c* disjoint from everything
    assert stats["new_posts"] == 2
    over, carried = probes[-1]
    assert over == 0 and carried >= n_files_before, probes

    # overlap ONLY the b-range: some files read, a-range files skipped
    stats = batch(["b0", "c9"])
    assert stats["new_posts"] == 1  # b0 exists; only c9 is new
    over, carried = probes[-1]
    assert over >= 1, probes
    assert carried >= 1, f"anti-join rescanned every file: {probes}"

    assert {r["id"] for r in posts_t.read().collect()} == {
        "a0", "a1", "a2", "b0", "b1", "b2", "c0", "c1", "c9",
    }


def test_hashtag_pipeline_with_enrichment(spark, tmp_path):
    posts_t, users_t, locations_t = tables(spark, tmp_path)
    raw = parse(
        spark,
        [graphql_page("food", [gql_node("1", "AAA", 10, "kimchi fried rice kimchi dinner tonight")])],
        S.RAW_TAG_PAGE_GRAPHQL,
    )
    d = parse(spark, [detail("AAA", "alice", None)], S.RAW_POST_DETAIL)
    run_hashtag_batch(
        spark, raw, None, d, None, posts_t, users_t, locations_t, batch_ts=T1, enrich=True
    )
    post = posts_t.read().collect()[0]
    assert post["labels"] and all(50 <= l["confidence"] <= 100 for l in post["labels"])
    assert post["topics"] and post["topics"][0]["name"] == "kimchi"
    assert post["topics"][0]["confidence"] > post["topics"][-1]["confidence"] or len(post["topics"]) == 1
