"""Exchange-rate pipeline (module/dolar/eldolar.js:13-40): scraped rate
rows → projection with one shared batch timestamp → append-only
time-series insert (W6; Rate rows are never upserted, dolar/models.js).

Plus the two time-series reads the schema implies (SURVEY §7 step 8):
latest rate per entity (window row_number) and daily averages (tumbling
date aggregation). Both are plain DataFrame plans over the rates table —
at scale the table is partitioned by date so both prune.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_instagram_spark.operators.merge import MergeTable
from etl_instagram_spark.operators.projections import project_rates


def run_rates_batch(
    spark: SparkSession,
    raw_rows: DataFrame,
    rates_table: MergeTable,
    source: str = "eldolar",
    batch_ts: datetime | None = None,
) -> int:
    """One rates tick: project (shared created_at, eldolar.js:21) →
    append. O(batch): MergeTable.append never reads the table."""
    batch_ts = batch_ts or datetime.now(timezone.utc)
    rates = project_rates(raw_rows, batch_ts=batch_ts, source=source)
    n = rates.count()
    if n:
        rates_table.append(rates)
    return n


def latest_rate_per_entity(rates: DataFrame) -> DataFrame:
    """Most recent row per entity (ties by buy for determinism)."""
    w = Window.partitionBy("entity").orderBy(
        F.col("created_at").desc(), F.col("buy").desc()
    )
    return (
        rates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def daily_rate_averages(rates: DataFrame) -> DataFrame:
    """Per entity × day: average buy/sell + spread."""
    return (
        rates.groupBy("entity", F.to_date("created_at").alias("day"))
        .agg(
            F.round(F.avg("buy"), 4).alias("avg_buy"),
            F.round(F.avg("sell"), 4).alias("avg_sell"),
            F.round(F.avg(F.col("sell") - F.col("buy")), 4).alias("avg_spread"),
            F.count("*").alias("n_quotes"),
        )
        .orderBy("entity", "day")
    )
