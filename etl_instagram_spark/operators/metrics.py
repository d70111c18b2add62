"""Observable metrics (A5): the reference's per-run progress counters
(posts-from-hashtags.js:292, 344, 350) as ``df.observe`` metrics that
piggyback on the job's existing action instead of costing extra
``count()`` passes.

``Observation`` works for batch; for streams the same ``observe`` call
surfaces per-batch metrics through ``StreamingQueryListener``
(``progress.observedMetrics``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, *metrics) -> tuple[DataFrame, Observation]:
    """Attach named metrics; read ``obs.get`` AFTER the first action on
    the returned frame. Default metric set: row count."""
    obs = Observation(name)
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("n_rows"),)
    return df.observe(obs, *metrics), obs


def observed_counts(df: DataFrame, name: str, *sum_cols: str) -> tuple[DataFrame, Observation]:
    """Row count + per-column sums in one observation."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    return observed(df, name, *metrics)
