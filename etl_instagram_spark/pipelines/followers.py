"""Follower-enrichment pipeline (module/instagram/extend-followers.js):
the reference's only genuine query (S11) + partial upsert (W3) +
gone-page tombstone delete (W7).

Reference flow: find followers not yet enriched (biography $exists:0),
newest first, take N (extend-followers.js:80-92); fetch each profile;
delete followers whose page is gone (:116); merge fetched fields into the
stored row (:126-128).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_instagram_spark.operators.merge import MergeTable
from etl_instagram_spark.operators.projections import project_follower


def select_followers_to_enrich(followers: DataFrame, limit: int = 10) -> DataFrame:
    """S11: unenriched followers, most recently updated first, top-N
    (extend-followers.js:80-92; limit 10 prod / 1 dev). TakeOrdered —
    no full sort."""
    return (
        followers.filter(F.col("biography").isNull())
        .orderBy(F.col("updated_at").desc())
        .limit(limit)
    )


def run_follower_batch(
    spark: SparkSession,
    raw_profiles: DataFrame,
    gone_usernames: DataFrame,
    followers_table: MergeTable,
) -> dict[str, int]:
    """One enrichment tick: project fetched profiles → W7 delete gone
    pages → W3 partial upsert (only fetched fields overwrite; everything
    else preserved via coalesce)."""
    enriched = project_follower(raw_profiles)
    n_gone = gone_usernames.count()
    if n_gone:
        followers_table.delete(gone_usernames)
    n_enriched = enriched.count()
    if n_enriched:
        followers_table.upsert_coalesce(enriched)
    return {"enriched": n_enriched, "deleted": n_gone}
