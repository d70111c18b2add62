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
