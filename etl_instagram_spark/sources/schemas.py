"""Explicit schemas for the raw scraped shapes and normalized entities.

Raw shapes mirror what the reference extracts from page JSON
(posts-from-hashtags.js:115, 34-57, 210-233, 131-141;
extend-followers.js:48-66); normalized entities mirror its mongoose
models (module/instagram/models.js, module/news/models.js,
module/dolar/models.js) with honest types — counts are BIGINT and flags
BOOLEAN even where the reference declared String (models.js:10-11, 20);
the cast is part of normalization (SURVEY §1.2).

Schemas are Spark DDL strings: usable directly by ``from_json``,
``spark.createDataFrame``, and streaming ``readStream.schema`` — and
readable in a review diff.
"""

from __future__ import annotations

# -- raw shapes (§1 FIXTURES.md) --------------------------------------------

RAW_TAG_PAGE_GRAPHQL = """
    hashtag STRING,
    graphql STRUCT<
      hashtag: STRUCT<
        edge_hashtag_to_media: STRUCT<
          edges: ARRAY<STRUCT<
            node: STRUCT<
              id: STRING,
              shortcode: STRING,
              thumbnail_src: STRING,
              accessibility_caption: STRING,
              __typename: STRING,
              edge_media_preview_like: STRUCT<count: BIGINT>,
              edge_media_to_comment: STRUCT<count: BIGINT>,
              edge_media_to_caption: STRUCT<
                edges: ARRAY<STRUCT<node: STRUCT<text: STRING>>>>>>>>>>
"""

RAW_TAG_PAGE_SECTIONS = """
    hashtag STRING,
    data STRUCT<
      recent: STRUCT<
        sections: ARRAY<STRUCT<
          layout_content: STRUCT<
            medias: ARRAY<STRUCT<
              media: STRUCT<
                id: STRING,
                code: STRING,
                like_count: BIGINT,
                comment_count: BIGINT,
                caption: STRUCT<text: STRING>,
                image_versions2: STRUCT<candidates: ARRAY<STRUCT<url: STRING>>>,
                carousel_media: ARRAY<STRUCT<
                  image_versions2: STRUCT<candidates: ARRAY<STRUCT<url: STRING>>>>>>>>>>>>>
"""

RAW_POST_DETAIL = """
    shortcode STRING,
    data STRUCT<shortcode_media: STRUCT<
      owner: STRUCT<
        id: STRING, username: STRING, full_name: STRING, profile_pic_url: STRING,
        edge_followed_by: STRUCT<count: BIGINT>,
        edge_owner_to_timeline_media: STRUCT<count: BIGINT>>,
      location: STRUCT<id: STRING, name: STRING, slug: STRING,
                       has_public_page: BOOLEAN, address_json: STRING>>>
"""

RAW_LOCATION_DETAIL = """
    location_id STRING,
    graphql STRUCT<location: STRUCT<phone: STRING, primary_alias_on_fb: STRING,
      website: STRING, blurb: STRING, lat: DOUBLE, lng: DOUBLE>>,
    native_location_data STRUCT<location_info: STRUCT<phone: STRING,
      primary_alias_on_fb: STRING, website: STRING, blurb: STRING,
      lat: DOUBLE, lng: DOUBLE>>
"""

RAW_PROFILE_PAGE = """
    username STRING,
    graphql STRUCT<user: STRUCT<
      biography: STRING, category_name: STRING, business_category_name: STRING,
      is_business_account: BOOLEAN, is_professional_account: BOOLEAN,
      is_verified: BOOLEAN,
      edge_follow: STRUCT<count: BIGINT>,
      edge_followed_by: STRUCT<count: BIGINT>,
      edge_owner_to_timeline_media: STRUCT<
        count: BIGINT,
        edges: ARRAY<STRUCT<node: STRUCT<
          id: STRING, shortcode: STRING, display_url: STRING,
          accessibility_caption: STRING, __typename: STRING,
          edge_liked_by: STRUCT<count: BIGINT>,
          edge_media_to_comment: STRUCT<count: BIGINT>,
          edge_media_to_caption: STRUCT<edges: ARRAY<STRUCT<node: STRUCT<text: STRING>>>>>>>>>>
"""

RAW_NEWS_ITEMS = "title STRING, url STRING, image STRING, paragraphs ARRAY<STRING>"

RAW_RATE_ROWS = "entity STRING, url STRING, buy STRING, sell STRING"

RAW_PAGES = "url STRING, html STRING"

# -- normalized entities (§2 FIXTURES.md) -----------------------------------

LABEL_STRUCT = "STRUCT<confidence: DOUBLE, name: STRING>"

LOCATION_STRUCT = """STRUCT<id: STRING, name: STRING, slug: STRING,
    has_public_page: BOOLEAN, gps: STRUCT<type: STRING, coordinates: ARRAY<DOUBLE>>,
    address: STRING, phone: STRING, alias_on_fb: STRING, website: STRING,
    blurb: STRING>"""

USERS = """
    id STRING, username STRING, full_name STRING, profile_picture STRING,
    followed_by BIGINT, posts_count BIGINT,
    created_at TIMESTAMP, updated_at TIMESTAMP
"""

LOCATIONS = """
    id STRING, name STRING, slug STRING, has_public_page BOOLEAN,
    gps STRUCT<type: STRING, coordinates: ARRAY<DOUBLE>>,
    address STRING, phone STRING, alias_on_fb STRING, website STRING,
    blurb STRING, created_at TIMESTAMP, updated_at TIMESTAMP
"""

POSTS = f"""
    id STRING, like_count BIGINT, comments_count BIGINT,
    permalink STRING, shortcode STRING, caption STRING, media_url STRING,
    media_type STRING, source STRING, accessibility STRING,
    labels ARRAY<{LABEL_STRUCT}>, topics ARRAY<{LABEL_STRUCT}>,
    user STRUCT<id: STRING, username: STRING, full_name: STRING,
                profile_picture: STRING, followed_by: BIGINT, posts_count: BIGINT>,
    location STRUCT<id: STRING, name: STRING, slug: STRING,
                    has_public_page: BOOLEAN,
                    gps: STRUCT<type: STRING, coordinates: ARRAY<DOUBLE>>,
                    address: STRING, phone: STRING, alias_on_fb: STRING,
                    website: STRING, blurb: STRING>,
    created_at TIMESTAMP, updated_at TIMESTAMP
"""

NEWS = """
    url STRING, title STRING, source STRING, image STRING,
    description ARRAY<STRING>, created_at TIMESTAMP, updated_at TIMESTAMP
"""

RATES = """
    entity STRING, url STRING, buy DOUBLE, sell DOUBLE, source STRING,
    created_at TIMESTAMP
"""

# sentinel substrings that mark an error/login wall page (P11;
# posts-from-hashtags.js:90-109, is-login-required.js:7-18, elimparcial.js:69)
SENTINELS = (
    "Oops, an error occurred",
    "Content Unavailable",
    "Page Not Found • Instagram",
    "Login • Instagram",
    "Sign in ・ Cloudflare Access",
)
