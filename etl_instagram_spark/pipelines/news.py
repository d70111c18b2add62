"""News pipeline (module/news/elimparcial.js:23-118): scraped article
rows → sentinel filter → projection → url-dedup upsert.

The DOM-extraction step (S7/S8 querySelector loops) happens outside the
engine (or in a pandas-UDF parser upstream); the pipeline ingests the
post-extraction rows of FIXTURES.md §1.6 — title/url/image/paragraphs —
exactly what elimparcial.js:33-44 and :75-95 produce.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from etl_instagram_spark.operators.merge import MergeTable, anti_join_new
from etl_instagram_spark.operators.projections import project_news


def run_news_batch(
    spark: SparkSession,
    raw_items: DataFrame,
    news_table: MergeTable,
    origin: str,
    source: str = "elimparcial",
    batch_ts: datetime | None = None,
) -> int:
    """One news tick: project → J5 anti-join known urls → W4 upsert.
    Returns the number of new articles ingested (A5 counter)."""
    batch_ts = batch_ts or datetime.now(timezone.utc)
    items = project_news(raw_items, origin=origin, source=source)
    if news_table.exists():
        # pin before the overlap probe: a caller-supplied raw_items with
        # non-deterministic lineage re-evaluated between the probe and
        # the anti-join could emit urls never probed (same hazard
        # _merge_commit pins against)
        items = items.localCheckpoint(eager=True)
        items = anti_join_new(items, news_table.read_overlapping(items.select("url")), "url")
    n_new = items.count()
    if n_new:
        news_table.upsert(items, batch_ts=batch_ts)
    return n_new
