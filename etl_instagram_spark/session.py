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
        # prefer shuffled-hash over sort-merge when the planner's size
        # conditions hold (guide §3.1): skips both sort passes on
        # shuffle joins. Cluster-safe: the build side is still gated by
        # the planner's per-partition size check, and AQE can likewise
        # rewrite SMJ→SHJ at runtime when every post-shuffle partition
        # is under the local-map threshold (64 MB local default;
        # override per deployment via SPARK_GRAFT_SHJ_THRESHOLD —
        # size it to executor memory / cores).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", str(64 * 1024 * 1024)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
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
