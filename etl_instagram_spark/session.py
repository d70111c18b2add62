"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` (N from ``SPARK_GRAFT_CPUS``, default
32); the same settings are cluster-safe: AQE for runtime re-planning and
skew handling, UTC session timezone (required for DuckDB-oracle parity —
DuckDB timestamps are UTC-naive), Arrow for the pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "etl_instagram_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpu_count()
    if shuffle_partitions is None:
        # local mode: ~cores, not the 200 default (over-parallelized for
        # sub-GB inputs; at cluster scale this is set per-job or left to AQE).
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Join strategy (guide §3.1), adjudicated r20: the r19 static
        # preferSortMergeJoin=false measured NEUTRAL per-site
        # (interleaved min-of-5 at sf0.1: docs_near_dedup_summary
        # SMJ 1.47 vs SHJ 1.65, emb_semantic_dedup 1.97 vs 1.96,
        # events_dcm_quantiles 4.13 vs 3.90 — opposite signs, noise
        # scale), and the static planner path trusts build-side size
        # ESTIMATES: a post-filter misestimate makes SHJ OOM where
        # SMJ's sort would spill. So the default reverts to Spark's
        # sort-merge preference and SMJ→SHJ rewrites ride the AQE
        # threshold below, which is gated on MEASURED post-shuffle
        # sizes. Deployments that have verified bounded build sides can
        # re-enable via SPARK_GRAFT_PREFER_SHJ=1 (ADVICE r19 #2).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "false"
            if os.environ.get("SPARK_GRAFT_PREFER_SHJ", "0") == "1"
            else "true",
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # long-lived sessions (the 40-min test suite, multi-rep bench
        # runs) accumulate localCheckpoint/broadcast/shuffle blocks that
        # the ContextCleaner only reclaims after a JVM GC notices the
        # dead refs; the default periodic-GC interval is 30 MINUTES, so
        # a session degrades steadily for its whole first half hour
        # (r20: a 10 s streaming test read 62 s late in the suite).
        # 2 min keeps reclamation ahead of accumulation; at cluster
        # scale the same setting is the standard long-running-driver
        # hygiene knob.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # managed-table warehouse (bucketed tables); static conf, so set here
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
