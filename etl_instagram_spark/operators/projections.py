"""Projection/filter operators: raw scraped shapes → normalized records.

Each function is a pure DataFrame→DataFrame projection (SURVEY §2.2);
nested access, explode, coalesce and higher-order ``transform`` replace
the reference's imperative loops. All deterministic built-ins — Catalyst
pushes filters through them and prunes unread nested fields (parquet
nested-schema pruning), so at 100 TB the scan reads only the touched
leaves of the raw JSON structs.

Citations per operator:
- P1  posts_from_graphql      posts-from-hashtags.js:59-79
- P2  posts_from_sections     posts-from-hashtags.js:34-57
- P3  image_url (coalesce)    posts-from-hashtags.js:18-32
- P4/P5 project_location      posts-from-hashtags.js:131-141, 170-190
- P6  user_from_detail        posts-from-hashtags.js:214-223
- P7/P8 project_follower      extend-followers.js:16-41, 56-66
- P9  project_rates           eldolar.js:28-35
- P10 project_news            elimparcial.js:11-19, 33-44
- P11 split_sentinel_pages    posts-from-hashtags.js:90-109
- P12 drop_blocklisted        posts-from-hashtags.js:287-289
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_instagram_spark.sources.schemas import SENTINELS

PERMALINK_PREFIX = "https://www.instagram.com/p/"


def _caption(edges: Column) -> Column:
    """First caption edge's text; null-safe (F14, posts-from-hashtags.js:73)."""
    return F.try_element_at(edges, F.lit(1))["node"]["text"]


def posts_from_graphql(raw: DataFrame) -> DataFrame:
    """P1: legacy TagPage shape → flat post rows (source = hashtag)."""
    node = F.col("edge.node")
    return raw.select(
        F.col("hashtag"),
        F.explode(F.col("graphql.hashtag.edge_hashtag_to_media.edges")).alias("edge"),
    ).select(
        node["id"].alias("id"),
        node["edge_media_preview_like"]["count"].alias("like_count"),
        node["edge_media_to_comment"]["count"].alias("comments_count"),
        F.concat(F.lit(PERMALINK_PREFIX), node["shortcode"], F.lit("/")).alias("permalink"),
        node["shortcode"].alias("shortcode"),
        _caption(node["edge_media_to_caption"]["edges"]).alias("caption"),
        node["thumbnail_src"].alias("media_url"),
        node["__typename"].alias("media_type"),
        F.col("hashtag").alias("source"),
        node["accessibility_caption"].alias("accessibility"),
    )


def image_url(media: Column) -> Column:
    """P3: first image candidate, falling back to the first carousel
    item's candidates (posts-from-hashtags.js:18-32)."""
    direct = F.try_element_at(media["image_versions2"]["candidates"], F.lit(1))["url"]
    carousel = F.try_element_at(
        F.try_element_at(media["carousel_media"], F.lit(1))["image_versions2"]["candidates"],
        F.lit(1),
    )["url"]
    return F.coalesce(direct, carousel)


def posts_from_sections(raw: DataFrame) -> DataFrame:
    """P2: modern sections shape → flat post rows via double explode.
    No accessibility/media_type in this shape (union drift handled by
    unionByName(allowMissingColumns), O5)."""
    media = F.col("m.media")
    return (
        raw.select(
            F.col("hashtag"),
            F.explode(F.col("data.recent.sections")).alias("section"),
        )
        .select(
            F.col("hashtag"),
            F.explode(F.col("section.layout_content.medias")).alias("m"),
        )
        .select(
            media["id"].alias("id"),
            media["like_count"].alias("like_count"),
            media["comment_count"].alias("comments_count"),
            F.concat(F.lit(PERMALINK_PREFIX), media["code"], F.lit("/")).alias("permalink"),
            media["code"].alias("shortcode"),
            media["caption"]["text"].alias("caption"),
            image_url(media).alias("media_url"),
            F.col("hashtag").alias("source"),
        )
    )


def union_post_shapes(p1: DataFrame, p2: DataFrame) -> DataFrame:
    """O5: accumulate both tag-page shapes into one posts frame."""
    return p1.unionByName(p2, allowMissingColumns=True)


def user_from_detail(detail: DataFrame) -> DataFrame:
    """P6: post-detail owner → user rows keyed by shortcode."""
    owner = F.col("data.shortcode_media.owner")
    user_struct = F.struct(
        owner["id"].alias("id"),
        owner["username"].alias("username"),
        owner["full_name"].alias("full_name"),
        owner["profile_pic_url"].alias("profile_picture"),
        owner["edge_followed_by"]["count"].alias("followed_by"),
        owner["edge_owner_to_timeline_media"]["count"].alias("posts_count"),
    )
    return detail.select(
        F.col("shortcode"),
        # struct-of-nulls is NOT null — gate on the source struct so the
        # P13 user-missing drop sees a real NULL
        F.when(owner.isNotNull(), user_struct).alias("user"),
        F.col("data.shortcode_media.location")["id"].alias("location_id"),
    )


def project_location(detail: DataFrame) -> DataFrame:
    """P4+P5: coalesce the two location-API variants, then build the GPS
    point only when both coordinates exist (posts-from-hashtags.js:184-189)."""
    info = F.coalesce(F.col("graphql.location"), F.col("native_location_data.location_info"))
    gps = F.when(
        info["lat"].isNotNull() & info["lng"].isNotNull(),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(info["lng"], info["lat"]).alias("coordinates"),
        ),
    )
    return detail.select(
        F.col("location_id").alias("id"),
        info["phone"].alias("phone"),
        info["primary_alias_on_fb"].alias("alias_on_fb"),
        info["website"].alias("website"),
        info["blurb"].alias("blurb"),
        gps.alias("gps"),
    )


def project_follower(profile: DataFrame) -> DataFrame:
    """P7+P8: ProfilePage → follower row; media built with the
    ``transform`` higher-order function (no explode/regroup shuffle)."""
    user = F.col("graphql.user")
    media = F.transform(
        user["edge_owner_to_timeline_media"]["edges"],
        lambda e: F.struct(
            e["node"]["id"].alias("id"),
            e["node"]["edge_liked_by"]["count"].alias("like_count"),
            e["node"]["edge_media_to_comment"]["count"].alias("comments_count"),
            F.concat(F.lit(PERMALINK_PREFIX), e["node"]["shortcode"], F.lit("/")).alias("permalink"),
            e["node"]["shortcode"].alias("shortcode"),
            _caption(e["node"]["edge_media_to_caption"]["edges"]).alias("caption"),
            e["node"]["display_url"].alias("media_url"),
            e["node"]["__typename"].alias("media_type"),
            F.lit("followers").alias("source"),
            e["node"]["accessibility_caption"].alias("accessibility"),
        ),
    )
    return profile.select(
        F.col("username"),
        user["biography"].alias("biography"),
        F.coalesce(user["category_name"], user["business_category_name"]).alias("category_name"),
        user["edge_follow"]["count"].alias("following"),
        user["edge_followed_by"]["count"].alias("followers"),
        user["edge_owner_to_timeline_media"]["count"].alias("posts"),
        user["is_business_account"].alias("is_business_account"),
        user["is_professional_account"].alias("is_professional_account"),
        user["is_verified"].alias("is_verified"),
        media.alias("media"),
    )


def project_rates(raw: DataFrame, batch_ts: datetime, source: str = "eldolar") -> DataFrame:
    """P9: rate rows — '//' protocol strip, sell falls back to buy,
    string→double casts, one shared batch timestamp (eldolar.js:21-35)."""
    return raw.select(
        F.col("entity"),
        F.regexp_replace(F.col("url"), r"^//", "").alias("url"),
        F.col("buy").cast("double").alias("buy"),
        F.coalesce(F.col("sell"), F.col("buy")).cast("double").alias("sell"),
        F.lit(source).alias("source"),
        F.lit(batch_ts).cast("timestamp").alias("created_at"),
    )


def project_news(raw: DataFrame, origin: str, source: str = "elimparcial") -> DataFrame:
    """P10: news rows — image URL absolutized against the site origin
    (elimparcial.js:11-19)."""
    img = F.col("image")
    absolute = F.when(
        img.isNull() | img.contains("http"), img
    ).otherwise(F.concat(F.lit(origin), img))
    return raw.select(
        F.col("url"),
        F.col("title"),
        F.lit(source).alias("source"),
        absolute.alias("image"),
        F.col("paragraphs").alias("description"),
    )


def split_sentinel_pages(
    pages: DataFrame, html_col: str = "html", sentinels: Sequence[str] = SENTINELS
) -> tuple[DataFrame, DataFrame]:
    """P11/E3: (clean_pages, dead_letter). Bad pages are routed to a
    side output with the matched sentinel instead of failing the job —
    the engine's replacement for screenshot+email (W9/W10)."""
    marker = F.coalesce(
        *[F.when(F.col(html_col).contains(s), F.lit(s)) for s in sentinels]
    )
    tagged = pages.withColumn("__sentinel", marker)
    clean = tagged.filter(F.col("__sentinel").isNull()).drop("__sentinel")
    dead = tagged.filter(F.col("__sentinel").isNotNull()).withColumnRenamed(
        "__sentinel", "sentinel"
    )
    return clean, dead


def drop_blocklisted(posts: DataFrame, blocklist: Sequence[str], username_col: str = "user.username") -> DataFrame:
    """P12/J6: drop posts authored by blocklisted usernames. For a short
    list ``isin`` folds to an in-filter on the scan; a large blocklist
    should instead broadcast-anti-join a blocklist table."""
    if not blocklist:
        return posts
    return posts.filter(
        F.col(username_col).isNull() | ~F.col(username_col).isin(list(blocklist))
    )
