#!/usr/bin/env python
"""Benchmark harness: times every inventory query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Timing is per-query wall time of plan + execution via a cheap full-result
materialization (``df.write.format("noop")`` is not in OSS pyspark's
stable surface, so we use count-style ``collect`` on small results; every
inventory query returns a bounded result set by design — aggregations /
top-k — so collect is the action, not a data transfer).

Each query is run ``SPARK_GRAFT_BENCH_REPS`` times (default 3) and the
reported per-query number is the MEDIAN, so single-run noise (GC pauses,
page-cache misses) stops masquerading as regressions. ``queries_min``
carries the per-query minimum for readers who want the noise floor.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def etl_tick_seconds(spark, n_pages: int = 10_000, posts_per_page: int = 3) -> float:
    """End-to-end ETL throughput: ONE hashtag_tick over ``n_pages``
    synthetic tag pages (fetch stub → sentinel split → shared-data
    extract → from_json → projection → anti-join → detail join → topics
    enrichment → MergeTable upserts). The relational inventory above
    measures query plans; this measures the scraper-pipeline surface,
    which otherwise has correctness coverage but no perf series. Page
    HTML is generated deterministically inside the fetch worker, so the
    run is self-contained and sf-independent."""
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_instagram_spark.config import EngineConfig
    from etl_instagram_spark.operators.merge import MergeTable
    from etl_instagram_spark.pipelines.orchestrator import hashtag_tick

    n_posts = n_pages * posts_per_page

    def fetcher(url: str) -> str:
        import json as j

        tag = url.rstrip("/").rsplit("/", 1)[-1]
        i = int(tag[3:])
        nodes = []
        for p in range(posts_per_page):
            idx = i * posts_per_page + p
            nodes.append(
                {
                    "id": str(idx),
                    "shortcode": f"SC{idx}",
                    "thumbnail_src": f"https://cdn/{idx}.jpg",
                    "accessibility_caption": "Photo",
                    "__typename": "GraphImage",
                    "edge_media_preview_like": {"count": idx % 500},
                    "edge_media_to_comment": {"count": idx % 37},
                    "edge_media_to_caption": {
                        "edges": [
                            {
                                "node": {
                                    "text": f"kimchi fried rice batch {idx} "
                                    "spark shuffle scale pipeline data"
                                }
                            }
                        ]
                    },
                }
            )
        shared = {
            "entry_data": {
                "TagPage": [
                    {
                        "graphql": {
                            "hashtag": {"edge_hashtag_to_media": {"edges": [{"node": n} for n in nodes]}}
                        }
                    }
                ]
            }
        }
        return (
            "<html><head><script>window._sharedData = "
            + j.dumps(shared)
            + ";</script></head><body>tag page</body></html>"
        )

    # one detail row per shortcode, built as columns (no driver-side JSON)
    loc_t = (
        "struct<id:string,name:string,slug:string,"
        "has_public_page:boolean,address_json:string>"
    )
    ids = spark.range(n_posts).select(F.col("id").cast("int").alias("i"))
    owner = F.struct(
        F.concat(F.lit("u-user"), F.col("i") % 1000).alias("id"),
        F.concat(F.lit("user"), F.col("i") % 1000).alias("username"),
        F.concat(F.lit("User "), F.col("i") % 1000).alias("full_name"),
        F.lit("https://cdn/u.jpg").alias("profile_pic_url"),
        F.struct(F.lit(100).cast("bigint").alias("count")).alias("edge_followed_by"),
        F.struct(F.lit(50).cast("bigint").alias("count")).alias(
            "edge_owner_to_timeline_media"
        ),
    )
    details = ids.select(
        F.concat(F.lit("SC"), F.col("i")).alias("shortcode"),
        F.struct(
            F.struct(
                owner.alias("owner"), F.lit(None).cast(loc_t).alias("location")
            ).alias("shortcode_media")
        ).alias("data"),
    )

    cfg = EngineConfig(
        env_name="production",
        hashtags=tuple(f"tag{i:05d}" for i in range(n_pages)),
        dev_limit=None,
        fetch_interval_s=0.0,
    )
    work = tempfile.mkdtemp(prefix="bench_etl_")
    try:
        tables = {
            name: MergeTable(spark, os.path.join(work, name), key)
            for name, key in (
                ("posts", "id"),
                ("users", "id"),
                ("locations", "id"),
                ("dead", "url"),
            )
        }
        t0 = time.perf_counter()
        stats = hashtag_tick(
            spark,
            cfg,
            details,
            tables["posts"],
            tables["users"],
            tables["locations"],
            tables["dead"],
            fetcher=fetcher,
            enrich=True,
        )
        elapsed = time.perf_counter() - t0
        if stats is None or stats.get("new_posts") != n_posts:
            raise RuntimeError(f"etl tick did not ingest {n_posts} posts: {stats}")
        return elapsed
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    import __spark_entry__ as entrymod
    from etl_instagram_spark.session import get_spark

    spark = get_spark("bench")
    queries = entrymod.queries()

    # warm the JVM, parquet footers, and OS page cache once so per-query
    # numbers measure the queries, not session startup / cold IO
    spark.range(1).count()
    from etl_instagram_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        try:
            load_table(spark, SF_DIR, t).count()
        except Exception:  # noqa: BLE001 — missing table is a query-time error
            pass

    timings: dict[str, float] = {}
    minima: dict[str, float] = {}
    for name, fn in queries.items():
        samples: list[float] = []
        try:
            for _ in range(REPS):
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                _ = len(rows)
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
            minima[name] = round(min(samples), 4)
        except Exception as exc:  # noqa: BLE001 — record, don't abort the bench
            timings[name] = -1.0
            minima[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)

    # ETL pipeline throughput: fresh MergeTable state per rep, median kept
    etl_samples: list[float] = []
    try:
        for _ in range(REPS):
            etl_samples.append(etl_tick_seconds(spark))
        timings["etl_hashtag_tick"] = round(statistics.median(etl_samples), 4)
        minima["etl_hashtag_tick"] = round(min(etl_samples), 4)
    except Exception as exc:  # noqa: BLE001 — record, don't abort the bench
        timings["etl_hashtag_tick"] = -1.0
        minima["etl_hashtag_tick"] = -1.0
        print(f"# bench error etl_hashtag_tick: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": minima,
                "reps": REPS,
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )
    return 0 if all(t >= 0 for t in timings.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
