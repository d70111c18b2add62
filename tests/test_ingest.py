"""Projection-operator tests on FIXTURES.md raw shapes (JSON fixtures →
from_json with explicit schemas → P1-P12)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_instagram_spark.operators import projections as P
from etl_instagram_spark.sources import schemas as S


def parse(spark, rows: list[dict], ddl: str):
    from etl_instagram_spark.sources.tables import parse_json_pages

    df = spark.createDataFrame([(json.dumps(r),) for r in rows], "raw string")
    return parse_json_pages(df, "raw", ddl)


def graphql_page(hashtag: str, nodes: list[dict]) -> dict:
    return {
        "hashtag": hashtag,
        "graphql": {"hashtag": {"edge_hashtag_to_media": {"edges": [{"node": n} for n in nodes]}}},
    }


def gql_node(pid: str, shortcode: str, likes: int, caption: str | None = None) -> dict:
    return {
        "id": pid,
        "shortcode": shortcode,
        "thumbnail_src": f"https://cdn/{pid}.jpg",
        "accessibility_caption": "Photo",
        "__typename": "GraphImage",
        "edge_media_preview_like": {"count": likes},
        "edge_media_to_comment": {"count": 2},
        "edge_media_to_caption": {
            "edges": [] if caption is None else [{"node": {"text": caption}}]
        },
    }


def sections_page(hashtag: str, medias: list[dict]) -> dict:
    return {
        "hashtag": hashtag,
        "data": {"recent": {"sections": [{"layout_content": {"medias": [{"media": m} for m in medias]}}]}},
    }


def sec_media(pid: str, code: str, likes: int, direct_img: bool, carousel_img: bool) -> dict:
    m: dict = {
        "id": pid,
        "code": code,
        "like_count": likes,
        "comment_count": 5,
        "caption": {"text": f"caption {pid}"},
    }
    if direct_img:
        m["image_versions2"] = {"candidates": [{"url": f"https://cdn/{pid}-direct.jpg"}]}
    if carousel_img:
        m["carousel_media"] = [
            {"image_versions2": {"candidates": [{"url": f"https://cdn/{pid}-carousel.jpg"}]}}
        ]
    return m


def test_posts_from_graphql(spark):
    raw = parse(
        spark,
        [graphql_page("food", [gql_node("1", "AAA", 10, "hello #food"), gql_node("2", "BBB", 20, None)])],
        S.RAW_TAG_PAGE_GRAPHQL,
    )
    out = {r["id"]: r for r in P.posts_from_graphql(raw).collect()}
    assert out["1"]["permalink"] == "https://www.instagram.com/p/AAA/"
    assert out["1"]["caption"] == "hello #food"
    assert out["1"]["like_count"] == 10 and out["1"]["source"] == "food"
    assert out["2"]["caption"] is None  # empty caption edges → null (F14)
    assert out["2"]["media_type"] == "GraphImage"


def test_posts_from_sections_image_coalesce(spark):
    raw = parse(
        spark,
        [
            sections_page(
                "travel",
                [
                    sec_media("10", "CCC", 7, True, True),   # direct wins
                    sec_media("11", "DDD", 8, False, True),  # carousel fallback
                    sec_media("12", "EEE", 9, False, False), # neither → null
                ],
            )
        ],
        S.RAW_TAG_PAGE_SECTIONS,
    )
    out = {r["id"]: r for r in P.posts_from_sections(raw).collect()}
    assert out["10"]["media_url"] == "https://cdn/10-direct.jpg"
    assert out["11"]["media_url"] == "https://cdn/11-carousel.jpg"
    assert out["12"]["media_url"] is None
    assert out["10"]["source"] == "travel" and out["10"]["comments_count"] == 5


def test_union_post_shapes_schema_drift(spark):
    p1 = P.posts_from_graphql(
        parse(spark, [graphql_page("x", [gql_node("1", "AAA", 1, "c")])], S.RAW_TAG_PAGE_GRAPHQL)
    )
    p2 = P.posts_from_sections(
        parse(spark, [sections_page("x", [sec_media("2", "BBB", 2, True, False)])], S.RAW_TAG_PAGE_SECTIONS)
    )
    u = P.union_post_shapes(p1, p2)
    assert u.count() == 2
    rows = {r["id"]: r for r in u.collect()}
    assert rows["2"]["media_type"] is None  # missing in sections shape (O5)
    assert rows["1"]["media_type"] == "GraphImage"


def detail(shortcode: str, username: str | None, loc_id: str | None = None) -> dict:
    d: dict = {"shortcode": shortcode, "data": {"shortcode_media": {}}}
    if username is not None:
        d["data"]["shortcode_media"]["owner"] = {
            "id": f"u-{username}",
            "username": username,
            "full_name": username.title(),
            "profile_pic_url": f"https://cdn/{username}.jpg",
            "edge_followed_by": {"count": 100},
            "edge_owner_to_timeline_media": {"count": 50},
        }
    if loc_id is not None:
        d["data"]["shortcode_media"]["location"] = {
            "id": loc_id, "name": "Place", "slug": "place",
            "has_public_page": True, "address_json": "{}",
        }
    return d


def test_user_from_detail(spark):
    raw = parse(spark, [detail("AAA", "alice", "L1"), detail("BBB", None)], S.RAW_POST_DETAIL)
    out = {r["shortcode"]: r for r in P.user_from_detail(raw).collect()}
    assert out["AAA"]["user"]["username"] == "alice"
    assert out["AAA"]["user"]["followed_by"] == 100
    assert out["AAA"]["location_id"] == "L1"
    assert out["BBB"]["user"] is None  # P13 drop case upstream


def loc_detail(lid: str, variant: str, lat=19.4, lng=-99.1) -> dict:
    info = {"phone": "555", "primary_alias_on_fb": "alias", "website": "https://w",
            "blurb": "b", "lat": lat, "lng": lng}
    d: dict = {"location_id": lid}
    if variant == "graphql":
        d["graphql"] = {"location": info}
    elif variant == "native":
        d["native_location_data"] = {"location_info": info}
    return d


def test_project_location_variants_and_gps(spark):
    raw = parse(
        spark,
        [
            loc_detail("L1", "graphql"),
            loc_detail("L2", "native"),
            loc_detail("L3", "graphql", lat=None),  # one coord missing → no gps
            loc_detail("L4", "none"),
        ],
        S.RAW_LOCATION_DETAIL,
    )
    out = {r["id"]: r for r in P.project_location(raw).collect()}
    assert out["L1"]["gps"]["coordinates"] == [-99.1, 19.4]  # [lng, lat]
    assert out["L2"]["phone"] == "555"  # native variant coalesced
    assert out["L3"]["gps"] is None
    assert out["L4"]["phone"] is None


def test_project_follower_media_transform(spark):
    node = {
        "id": "p1", "shortcode": "SC1", "display_url": "https://cdn/p1.jpg",
        "accessibility_caption": "acc", "__typename": "GraphImage",
        "edge_liked_by": {"count": 3},
        "edge_media_to_comment": {"count": 1},
        "edge_media_to_caption": {"edges": [{"node": {"text": "cap"}}]},
    }
    raw = parse(
        spark,
        [{
            "username": "bob",
            "graphql": {"user": {
                "biography": "bio", "category_name": None,
                "business_category_name": "Biz",
                "is_business_account": True, "is_professional_account": False,
                "is_verified": False,
                "edge_follow": {"count": 10}, "edge_followed_by": {"count": 20},
                "edge_owner_to_timeline_media": {"count": 2, "edges": [{"node": node}]},
            }},
        }],
        S.RAW_PROFILE_PAGE,
    )
    row = P.project_follower(raw).collect()[0]
    assert row["category_name"] == "Biz"  # coalesce fallback
    assert row["media"][0]["source"] == "followers"
    assert row["media"][0]["like_count"] == 3
    assert row["media"][0]["permalink"] == "https://www.instagram.com/p/SC1/"


def test_project_rates(spark):
    from datetime import datetime, timezone

    ts = datetime(2021, 3, 1, tzinfo=timezone.utc)
    raw = spark.createDataFrame(
        [("BankA", "//bank-a.mx", "19.5", "19.9"), ("BankB", "https://b.mx", "20.1", None)],
        S.RAW_RATE_ROWS,
    )
    out = {r["entity"]: r for r in P.project_rates(raw, ts).collect()}
    assert out["BankA"]["url"] == "bank-a.mx"  # protocol strip
    assert out["BankB"]["sell"] == 20.1  # sell falls back to buy
    assert out["BankA"]["source"] == "eldolar"
    assert out["BankA"]["created_at"] == out["BankB"]["created_at"]  # shared batch ts


def test_project_news_image_absolutize(spark):
    raw = spark.createDataFrame(
        [("T1", "https://n.mx/a1", "/img/a1.jpg", ["p1", "p2"]),
         ("T2", "https://n.mx/a2", "https://cdn/x.jpg", ["p"])],
        S.RAW_NEWS_ITEMS,
    )
    out = {r["url"]: r for r in P.project_news(raw, "https://n.mx").collect()}
    assert out["https://n.mx/a1"]["image"] == "https://n.mx/img/a1.jpg"
    assert out["https://n.mx/a2"]["image"] == "https://cdn/x.jpg"
    assert out["https://n.mx/a1"]["description"] == ["p1", "p2"]


def test_split_sentinel_pages(spark):
    pages = spark.createDataFrame(
        [("u1", "<html>Login • Instagram</html>"),
         ("u2", "<html>all good</html>"),
         ("u3", "<html>Oops, an error occurred</html>")],
        S.RAW_PAGES,
    )
    clean, dead = P.split_sentinel_pages(pages)
    assert [r["url"] for r in clean.collect()] == ["u2"]
    got = {r["url"]: r["sentinel"] for r in dead.collect()}
    assert got == {"u1": "Login • Instagram", "u3": "Oops, an error occurred"}


def test_drop_blocklisted(spark):
    df = spark.createDataFrame(
        [("1", ("spammer",)), ("2", ("alice",)), ("3", None)],
        "id string, user struct<username: string>",
    )
    out = P.drop_blocklisted(df, ["spammer"])
    assert sorted(r["id"] for r in out.collect()) == ["2", "3"]  # null user kept
