"""The hashtag-posts pipeline: the reference's main ETL
(posts-from-hashtags.js:358-381 / 291-356) as one declarative lineage.

Reference flow (per post, sequential):
existence check → detail fetch → null-user drop → blocklist → user upsert
→ location lookup/insert → labels → topics → post upsert.

Spark flow (per batch, set-oriented — SURVEY §3.1):

    raw (P1 ∪ P2) → dedup within batch → J3 anti-join existing (BEFORE
    enrichment: the anti-join prunes work exactly like the reference's
    existence check, and Catalyst won't reorder through enrichment UDFs)
    → J1 join details → P13 null-user drop → P12 blocklist →
    J2 location dimension upsert + join → W2 upsert users →
    W1 upsert posts (timestamps stamped, F13).

Scale notes (100 TB): the detail/location sides are per-batch fetches —
O(batch), broadcastable; the only big state is the posts table itself,
touched via key-anti-join and the MergeTable snapshot write. Enrichment
columns (labels/topics) are separate operators applied to the batch frame
before upsert (see enrich/).
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_instagram_spark.operators.merge import MergeTable, anti_join_new, dedup_latest
from etl_instagram_spark.operators.metrics import observed
from etl_instagram_spark.operators.projections import (
    drop_blocklisted,
    posts_from_graphql,
    posts_from_sections,
    project_location,
    union_post_shapes,
    user_from_detail,
)
from etl_instagram_spark.sources.schemas import LABEL_STRUCT, LOCATION_STRUCT


def _empty_labels() -> "F.Column":
    return F.lit(None).cast(f"ARRAY<{LABEL_STRUCT}>")


def run_hashtag_batch(
    spark: SparkSession,
    raw_graphql: DataFrame | None,
    raw_sections: DataFrame | None,
    post_details: DataFrame,
    location_details: DataFrame | None,
    posts_table: MergeTable,
    users_table: MergeTable,
    locations_table: MergeTable,
    blocklist: Sequence[str] = (),
    batch_ts: datetime | None = None,
    dev_limit: int | None = None,
    enrich: bool = False,
) -> dict[str, int]:
    """Run one hashtag micro-batch; returns per-stage row counts (the
    reference's progress counters A5, as driver-side metrics)."""
    batch_ts = batch_ts or datetime.now(timezone.utc)

    shapes = []
    if raw_graphql is not None:
        shapes.append(posts_from_graphql(raw_graphql))
    if raw_sections is not None:
        shapes.append(posts_from_sections(raw_sections))
    if not shapes:
        raise ValueError("no raw input provided")
    posts = shapes[0]
    for s in shapes[1:]:
        posts = union_post_shapes(posts, s)
    posts = dedup_latest(posts.withColumn("__ord", F.lit(0)), "id", "__ord").drop("__ord")
    if dev_limit is not None:  # P14 dev thinning
        posts = posts.limit(dev_limit)

    # J3: only NEW posts pay for enrichment (posts-from-hashtags.js:295-300).
    # Existence is a key-equality probe, so the anti-join only needs the
    # files whose key range can contain a batch id — O(overlapping
    # files), not a full-table scan per tick (read_overlapping).
    if posts_table.exists():
        # pin BEFORE the overlap probe: the probe and the later anti-join
        # actions must see identical rows — a non-deterministic lineage
        # (dev_limit above, caller-supplied raw frames) re-evaluated per
        # action could emit ids never probed, letting an existing row
        # escape the anti-join (same hazard _merge_commit pins against)
        posts = posts.localCheckpoint(eager=True)
        posts = anti_join_new(
            posts, posts_table.read_overlapping(posts.select("id")), "id"
        )
    # A5 counters as observations: they ride the upsert's action instead
    # of costing extra count() passes over the batch lineage
    posts, obs_new = observed(posts, "new_posts")

    # J1 + P13: attach author; drop detail-less posts (posts-from-hashtags.js:304-307)
    details = user_from_detail(post_details)
    posts = (
        posts.join(F.broadcast(details), on="shortcode", how="left")
        .filter(F.col("user").isNotNull())
    )
    # P12 blocklist (posts-from-hashtags.js:287-289)
    posts = drop_blocklisted(posts, blocklist)
    posts, obs_kept = observed(posts, "kept_posts")

    # J2: location dimension — insert unseen ids (W5 append-after-anti),
    # then attach the struct
    if location_details is not None:
        locations = project_location(location_details)
        if locations_table.exists():
            # same probe/join re-evaluation pin as the posts anti-join
            locations = locations.localCheckpoint(eager=True)
            locations = anti_join_new(
                locations,
                locations_table.read_overlapping(locations.select("id")),
                "id",
            )
        ts = F.lit(batch_ts).cast("timestamp")
        locations_table.append(
            locations.withColumn("created_at", ts).withColumn("updated_at", ts)
        )
    loc_dim = locations_table.read() if locations_table.exists() else None

    if loc_dim is not None:
        loc_struct = F.struct(
            *[F.col(f"__loc.{c}").alias(c) for c in loc_dim.columns if c not in ("created_at", "updated_at")]
        )
        posts = (
            posts.join(
                F.broadcast(loc_dim.select(F.struct(*loc_dim.columns).alias("__loc"))),
                posts["location_id"] == F.col("__loc.id"),
                "left",
            )
            .withColumn("location", F.when(F.col("__loc").isNotNull(), loc_struct))
            .drop("__loc")
        )
    else:
        posts = posts.withColumn("location", F.lit(None).cast(LOCATION_STRUCT))

    # Build the FULLY-enriched batch first, then pin it ONCE: the users
    # and posts upserts below both consume it, and without an eager
    # materialization each upsert's internal checkpoint would re-run the
    # whole fetch→extract→join→enrich lineage (r9 tick profile: ~70% of
    # tick time inside the two upserts). With enrich=True the
    # reference's per-post enrichment runs on the (already pruned)
    # batch: image labels via the pluggable classifier
    # (posts-from-hashtags.js:327-333) and caption topics
    # (posts-from-hashtags.js:335-338) — both AFTER the anti-join/
    # blocklist so only new, kept posts pay the Python-boundary cost.
    out = posts.drop("location_id")
    if enrich:
        from etl_instagram_spark.enrich.labels import attach_labels
        from etl_instagram_spark.enrich.topics import attach_topics

        out = attach_labels(out)
        out = attach_topics(out, out_col="topics")
    else:
        out = out.withColumn("labels", _empty_labels()).withColumn("topics", _empty_labels())
    # the single materialization of the tick: the first upsert action
    # populates the cache (lineage + enrichment run once), the second
    # reads it; observations (new/kept counters) fire exactly once.
    # cache, not localCheckpoint: an eager checkpoint here would
    # serialize the full wide frame to blocks up front — measured ~25%
    # slower per tick than letting the cache absorb the one required
    # materialization (the upserts' own internal pins still guarantee
    # probe/write row identity on the merge path)
    out = out.cache()

    # W2: upsert users extracted from the (cached) batch
    users = dedup_latest(
        out.select("user.*").withColumn("__ord", F.lit(0)), "id", "__ord"
    ).drop("__ord")
    users_table.upsert(users, batch_ts=batch_ts)

    # W1: upsert posts
    posts_table.upsert(out, batch_ts=batch_ts)

    stats = {
        "new_posts": int(obs_new.get["n_rows"]),
        "kept_posts": int(obs_kept.get["n_rows"]),
    }
    out.unpersist()
    return stats
