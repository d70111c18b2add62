"""Run orchestration: the engine's ``main.js`` analogue.

The reference wires cron → circuit-breaker gate → per-hashtag fetch →
embedded-JSON extract → enrich → upsert (main.js:35-53, 73;
posts-from-hashtags.js:358-381). The engine's tick is one function over
declarative stages, runnable from any scheduler (cron, Airflow, or the
streaming AvailableNow trigger in streaming/):

    config → seed URLs → fetch (throttled; stub offline) →
    P11 sentinel split (dead-letter + E1 trip) →
    S3 window._sharedData extract → from_json(TagPage[0]) →
    run_hashtag_batch (J3 anti-join → enrich → W1/W2 upserts).
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_instagram_spark.config import EngineConfig
from etl_instagram_spark.operators.merge import MergeTable
from etl_instagram_spark.operators.projections import split_sentinel_pages
from etl_instagram_spark.pipelines.hashtags import run_hashtag_batch
from etl_instagram_spark.sources.fetch import Fetcher, fetch_pages, stub_fetcher
from etl_instagram_spark.sources.html_extract import extract_embedded_json
from etl_instagram_spark.streaming.incremental import CircuitBreaker

# the true page shape: window._sharedData.entry_data.TagPage[0].graphql
# (posts-from-hashtags.js:115); the graphql subtree matches
# schemas.RAW_TAG_PAGE_GRAPHQL minus the seed-provided hashtag column
SHARED_DATA_TAG_DDL = """
    entry_data STRUCT<TagPage: ARRAY<STRUCT<
      graphql: STRUCT<
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
                  edges: ARRAY<STRUCT<node: STRUCT<text: STRING>>>>>>>>>>>>>
"""


def tag_pages_from_html(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """S3: fetched tag pages → (hashtag, graphql) raw rows: regex-extract
    the shared-data blob (JVM-side), ``from_json`` with the explicit
    shape, take ``TagPage[0]`` null-safely (F14)."""
    blob = extract_embedded_json(pages, html_col=html_col)
    sd = F.from_json("raw_json", SHARED_DATA_TAG_DDL)
    return blob.select(
        "hashtag",
        F.try_element_at(sd["entry_data"]["TagPage"], F.lit(1))["graphql"].alias("graphql"),
    ).filter(F.col("graphql").isNotNull())


def hashtag_tick(
    spark: SparkSession,
    cfg: EngineConfig,
    post_details: DataFrame,
    posts_table: MergeTable,
    users_table: MergeTable,
    locations_table: MergeTable,
    dead_letter: MergeTable,
    breaker: CircuitBreaker | None = None,
    fetcher: Fetcher = stub_fetcher,
    batch_ts: datetime | None = None,
    enrich: bool = True,
    on_alert: Callable[[str], None] | None = None,
) -> dict[str, int] | None:
    """One scheduled run over cfg.hashtags. Returns stage counters, or
    None when the breaker is tripped (E1, main.js gate). ``on_alert`` is
    the pluggable alert sink (support/email.js:15-21): fired at most once
    per incident type across ticks (deduped via ``breaker.alert_once``;
    with no breaker every incident alerts — nothing to dedup against)."""
    if breaker is not None and breaker.tripped():
        # a prior tick may have tripped before its alert landed (sink
        # outage): gated ticks keep retrying delivery until one succeeds
        if on_alert is not None and (reason := breaker.reason()):
            breaker.alert_once(reason, on_alert)
        return None
    batch_ts = batch_ts or datetime.now(timezone.utc)

    seeds = spark.createDataFrame(
        [(h, f"https://www.instagram.com/explore/tags/{h}/") for h in cfg.hashtags],
        "hashtag string, url string",
    )
    # materialize the fetch ONCE: downstream runs several actions over
    # this lineage (dead count / dead-letter write / sentinel probe /
    # batch ingest), and with a real rate-limited fetcher every
    # re-evaluation would be a full re-fetch of every page
    pages = fetch_pages(
        seeds, fetcher=fetcher, min_interval_s=cfg.fetch_interval_s, n_parallel=1
    ).localCheckpoint(eager=True)
    # politeness (E5) constrains the FETCH, not the compute: the
    # checkpointed pages sit in n_parallel=1 partition, and without a
    # fan-out every downstream stage — sentinel split, shared-data
    # extract, from_json, projection, topic enrichment — would run
    # single-threaded. The shuffle moves O(pages) HTML once; the
    # checkpoint guarantees it can never re-trigger the fetch.
    pages = pages.repartition(spark.sparkContext.defaultParallelism)
    clean, dead = split_sentinel_pages(pages)
    n_dead = dead.count()
    if n_dead:
        # upsert (keyed on the dead table's key): re-running a tick over
        # the same pages cannot double-write dead letters
        dead_letter.upsert(
            dead.withColumn("seen_at", F.lit(batch_ts).cast("timestamp"))
        )
        incident = dead.select("sentinel").first()["sentinel"]
        if breaker is not None:  # W9/E2: one alert, then gate future runs
            # trip BEFORE alerting so the gate engages even when the
            # sink raises; gated ticks retry delivery (see above)
            breaker.trip(incident)
            if on_alert is not None:
                breaker.alert_once(incident, on_alert)
        elif on_alert is not None:
            on_alert(incident)

    raw_graphql = tag_pages_from_html(clean)
    stats = run_hashtag_batch(
        spark,
        raw_graphql,
        None,
        post_details,
        None,
        posts_table,
        users_table,
        locations_table,
        blocklist=cfg.blocklist,
        batch_ts=batch_ts,
        dev_limit=cfg.dev_limit,
        enrich=enrich,
    )
    stats["dead_letter"] = n_dead
    return stats
