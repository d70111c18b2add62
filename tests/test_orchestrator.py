"""End-to-end orchestrator test: synthetic HTML pages with embedded
window._sharedData JSON → fetch stub → sentinel split → extract →
from_json → full hashtag batch → MergeTable state."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from etl_instagram_spark.config import EngineConfig
from etl_instagram_spark.operators.merge import MergeTable
from etl_instagram_spark.pipelines.orchestrator import hashtag_tick, tag_pages_from_html
from etl_instagram_spark.sources import schemas as S
from etl_instagram_spark.streaming.incremental import CircuitBreaker
from tests.test_ingest import detail, gql_node, parse

T1 = datetime(2021, 5, 1, tzinfo=timezone.utc)


def page_html(nodes: list[dict]) -> str:
    shared = {
        "entry_data": {
            "TagPage": [
                {"graphql": {"hashtag": {"edge_hashtag_to_media": {"edges": [{"node": n} for n in nodes]}}}}
            ]
        }
    }
    return (
        "<html><head><script>window._sharedData = "
        + json.dumps(shared)
        + ";</script></head><body>tag page</body></html>"
    )


def test_tag_pages_from_html_extraction(spark):
    pages = spark.createDataFrame(
        [("food", page_html([gql_node("1", "AAA", 5, "caption one")])),
         ("empty", "<html><body>no shared data here</body></html>")],
        "hashtag string, html string",
    )
    out = tag_pages_from_html(pages).collect()
    assert len(out) == 1  # page without the blob dropped
    node = out[0]["graphql"]["hashtag"]["edge_hashtag_to_media"]["edges"][0]["node"]
    assert node["shortcode"] == "AAA" and node["edge_media_preview_like"]["count"] == 5


def test_hashtag_tick_end_to_end_from_html(spark, tmp_path):
    posts_t = MergeTable(spark, str(tmp_path / "posts"), "id")
    users_t = MergeTable(spark, str(tmp_path / "users"), "id")
    locations_t = MergeTable(spark, str(tmp_path / "locations"), "id")
    dead_t = MergeTable(spark, str(tmp_path / "dead"), "url")
    breaker = CircuitBreaker(str(tmp_path / "breaker.flag"))
    cfg = EngineConfig.from_env({"ETL_ENV": "test", "ETL_HASHTAGS": "food,wall"})

    html_by_tag = {
        "food": page_html([gql_node("1", "AAA", 10, "kimchi rice kimchi")]),
        "wall": "<html>Login • Instagram</html>",  # sentinel page
    }

    def fetcher(url: str) -> str:
        tag = url.rstrip("/").rsplit("/", 1)[-1]
        return html_by_tag[tag]

    details = parse(spark, [detail("AAA", "alice", None)], S.RAW_POST_DETAIL)
    stats = hashtag_tick(
        spark, cfg, details, posts_t, users_t, locations_t, dead_t,
        breaker=breaker, fetcher=fetcher, batch_ts=T1, enrich=False,
    )
    # dev_limit=1 in test env keeps the one post; sentinel page dead-lettered
    assert stats == {"new_posts": 1, "kept_posts": 1, "dead_letter": 1}
    post = posts_t.read().collect()[0]
    assert post["id"] == "1" and post["user"]["username"] == "alice"
    assert dead_t.read().collect()[0]["sentinel"] == "Login • Instagram"
    assert breaker.tripped()

    # E1: the next tick is skipped entirely
    assert hashtag_tick(
        spark, cfg, details, posts_t, users_t, locations_t, dead_t,
        breaker=breaker, fetcher=fetcher, batch_ts=T1,
    ) is None


def test_tick_compute_is_not_single_partition(spark):
    """The politeness contract serializes the FETCH (n_parallel=1), but
    downstream compute must fan back out — without the post-checkpoint
    repartition every extract/projection/enrichment stage would inherit
    the fetch's single partition and run single-threaded at any scale."""
    from etl_instagram_spark.sources.fetch import fetch_pages

    seeds = spark.createDataFrame(
        [(f"t{i}", f"https://example.test/tags/t{i}/") for i in range(64)],
        "hashtag string, url string",
    )
    pages = fetch_pages(
        seeds, fetcher=lambda u: "<html>x</html>", n_parallel=1
    ).localCheckpoint(eager=True)
    assert pages.rdd.getNumPartitions() == 1  # the fetch side stays polite
    fanned = pages.repartition(spark.sparkContext.defaultParallelism)
    assert fanned.rdd.getNumPartitions() > 1  # the compute side does not


def test_fetch_runs_exactly_once_per_url_per_tick(spark, tmp_path):
    """The fetch lineage is materialized once (localCheckpoint): the
    tick's several downstream actions (dead count, dead-letter write,
    sentinel probe, ingest) must NOT re-run the fetch UDF — with a real
    throttled fetcher each re-evaluation is a full re-fetch."""
    import os

    marker_dir = str(tmp_path / "fetches")
    os.makedirs(marker_dir)
    html_by_tag = {
        "food": page_html([gql_node("1", "AAA", 10, "kimchi rice")]),
        "wall": "<html>Login • Instagram</html>",  # sentinel → dead path runs too
    }

    def counting_fetcher(url: str) -> str:
        # runs inside the Python worker: count via the filesystem
        import os as _os
        import uuid as _uuid

        tag = url.rstrip("/").rsplit("/", 1)[-1]
        open(_os.path.join(marker_dir, f"{tag}.{_uuid.uuid4().hex}"), "w").close()
        return html_by_tag[tag]

    posts_t = MergeTable(spark, str(tmp_path / "posts"), "id")
    users_t = MergeTable(spark, str(tmp_path / "users"), "id")
    locations_t = MergeTable(spark, str(tmp_path / "locations"), "id")
    dead_t = MergeTable(spark, str(tmp_path / "dead"), "url")
    cfg = EngineConfig.from_env({"ETL_ENV": "test", "ETL_HASHTAGS": "food,wall"})
    details = parse(spark, [detail("AAA", "alice", None)], S.RAW_POST_DETAIL)

    stats = hashtag_tick(
        spark, cfg, details, posts_t, users_t, locations_t, dead_t,
        fetcher=counting_fetcher, batch_ts=T1, enrich=False,
    )
    assert stats["dead_letter"] == 1
    fetched = sorted(m.split(".")[0] for m in os.listdir(marker_dir))
    assert fetched == ["food", "wall"]  # each URL exactly once


def test_alert_fires_once_per_incident_type(spark, tmp_path):
    """W9/E2 parity (support/email.js:15-21): the pluggable alert sink is
    invoked at most once per incident type, even when the gate is lifted
    and the same sentinel comes back on a later tick."""
    import os

    posts_t = MergeTable(spark, str(tmp_path / "posts"), "id")
    users_t = MergeTable(spark, str(tmp_path / "users"), "id")
    locations_t = MergeTable(spark, str(tmp_path / "locations"), "id")
    dead_t = MergeTable(spark, str(tmp_path / "dead"), "url")
    breaker = CircuitBreaker(str(tmp_path / "breaker.flag"))
    cfg = EngineConfig.from_env({"ETL_ENV": "test", "ETL_HASHTAGS": "wall"})
    details = parse(spark, [detail("AAA", "alice", None)], S.RAW_POST_DETAIL)
    fetcher = lambda url: "<html>Login • Instagram</html>"  # noqa: E731
    alerts: list[str] = []

    hashtag_tick(
        spark, cfg, details, posts_t, users_t, locations_t, dead_t,
        breaker=breaker, fetcher=fetcher, batch_ts=T1, enrich=False,
        on_alert=alerts.append,
    )
    assert alerts == ["Login • Instagram"]
    assert breaker.tripped()

    # operator lifts the gate but the incident type was already alerted:
    # the second sentinel tick dead-letters again without a second email
    os.remove(breaker.path)
    hashtag_tick(
        spark, cfg, details, posts_t, users_t, locations_t, dead_t,
        breaker=breaker, fetcher=fetcher, batch_ts=T1, enrich=False,
        on_alert=alerts.append,
    )
    assert alerts == ["Login • Instagram"]  # still exactly one
    # full reset clears the alert dedup too → a fresh incident re-alerts
    breaker.reset()
    assert breaker.alert_once("Login • Instagram")


def test_breaker_trips_even_when_alert_sink_fails(spark, tmp_path):
    """E1 over W9: the login-wall gate must engage even when alert
    delivery raises — and the gated tick retries delivery until one
    succeeds, so the alert is late, never lost."""
    import pytest as _pytest

    posts_t = MergeTable(spark, str(tmp_path / "posts"), "id")
    users_t = MergeTable(spark, str(tmp_path / "users"), "id")
    locations_t = MergeTable(spark, str(tmp_path / "locations"), "id")
    dead_t = MergeTable(spark, str(tmp_path / "dead"), "url")
    breaker = CircuitBreaker(str(tmp_path / "breaker.flag"))
    cfg = EngineConfig.from_env({"ETL_ENV": "test", "ETL_HASHTAGS": "wall"})
    details = parse(spark, [detail("AAA", "alice", None)], S.RAW_POST_DETAIL)
    fetcher = lambda url: "<html>Login • Instagram</html>"  # noqa: E731
    delivered: list[str] = []

    def broken(incident: str) -> None:
        raise ConnectionError("smtp down")

    with _pytest.raises(ConnectionError):
        hashtag_tick(
            spark, cfg, details, posts_t, users_t, locations_t, dead_t,
            breaker=breaker, fetcher=fetcher, batch_ts=T1, enrich=False,
            on_alert=broken,
        )
    assert breaker.tripped()  # the gate engaged despite the sink failure

    # gated tick: skipped (returns None) but retries the pending alert
    assert hashtag_tick(
        spark, cfg, details, posts_t, users_t, locations_t, dead_t,
        breaker=breaker, fetcher=fetcher, batch_ts=T1, enrich=False,
        on_alert=delivered.append,
    ) is None
    assert delivered == ["Login • Instagram"]
    # later gated ticks don't re-alert
    hashtag_tick(
        spark, cfg, details, posts_t, users_t, locations_t, dead_t,
        breaker=breaker, fetcher=fetcher, batch_ts=T1, enrich=False,
        on_alert=delivered.append,
    )
    assert delivered == ["Login • Instagram"]


def test_failed_alert_sink_is_retried(tmp_path):
    """Delivery-before-marking: a sink that raises (transient outage)
    must NOT durably mark the incident — the next run retries and the
    one promised alert is eventually delivered, not silently lost."""
    import pytest as _pytest

    breaker = CircuitBreaker(str(tmp_path / "b.flag"))
    delivered: list[str] = []

    def broken(incident: str) -> None:
        raise ConnectionError("smtp down")

    with _pytest.raises(ConnectionError):
        breaker.alert_once("Login • Instagram", broken)
    assert not breaker.alerted("Login • Instagram")  # unmarked → retryable

    assert breaker.alert_once("Login • Instagram", delivered.append)
    assert delivered == ["Login • Instagram"]
    assert breaker.alerted("Login • Instagram")
    # and now deduped as before
    assert not breaker.alert_once("Login • Instagram", delivered.append)
    assert delivered == ["Login • Instagram"]
