"""Column profiling: one-pass data-quality statistics per column.

Engine extension for pipeline observability (the reference logs only
run counters, support/metric.js; a 100-TB ingest needs per-column
profiles to catch schema drift, null storms, and key-cardinality
regressions before they poison downstream joins).

One ``df.agg`` computes every statistic — a single scan — and a
``stack`` reshapes the one aggregate row into one row per column, so
the result is O(columns) however large the input. Distinct counts
default to ``approx_count_distinct`` (HLL — mergeable, constant
memory); ``exact_distinct=True`` switches to exact COUNT(DISTINCT),
which Spark plans via Expand (one pass, rows × profiled-columns) — the
right choice for parity checks and small dimensions, the wrong one for
a 100-TB fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

PROFILE_SCHEMA = "(column, n_nulls, n_distinct, min_d, max_d, avg_d)"


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one scan. Output: one row per
    column — ``(column, n_rows, n_nulls, n_distinct, min_d, max_d,
    avg_d)`` with the numeric stats as round-4 doubles and NULL for
    non-numeric columns (strings/timestamps keep null/distinct counts,
    which is what drift detection actually uses)."""
    cols = list(cols) if cols is not None else list(df.columns)
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__nn_{i}"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"__nd_{i}")
        )
        if c in numeric:
            d = col.cast("double")
            aggs.append(F.round(F.min(d), 4).alias(f"__min_{i}"))
            aggs.append(F.round(F.max(d), 4).alias(f"__max_{i}"))
            aggs.append(F.round(F.avg(d), 4).alias(f"__avg_{i}"))
    one = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        name = "'" + c.replace("'", "\\'") + "'"
        mins, maxs, avgs = (
            (f"__min_{i}", f"__max_{i}", f"__avg_{i}")
            if c in numeric
            else ("CAST(NULL AS DOUBLE)",) * 3
        )
        parts.append(
            f"{name}, __n - __nn_{i}, __nd_{i}, {mins}, {maxs}, {avgs}"
        )
    return one.select(
        F.col("__n").alias("n_rows"),
        F.expr(f"stack({len(cols)}, {', '.join(parts)}) AS {PROFILE_SCHEMA}"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_d", "max_d", "avg_d")


def profile_drift(before: DataFrame, after: DataFrame) -> DataFrame:
    """Join two profiles on column name and surface the deltas a drift
    monitor alerts on: null-fraction change and distinct-count ratio.
    Both inputs are O(columns) rows, so this is driver-cheap by
    construction."""
    b = before.select(
        "column",
        F.col("n_rows").alias("n_rows_before"),
        F.col("n_nulls").alias("n_nulls_before"),
        F.col("n_distinct").alias("n_distinct_before"),
    )
    a = after.select(
        "column",
        F.col("n_rows").alias("n_rows_after"),
        F.col("n_nulls").alias("n_nulls_after"),
        F.col("n_distinct").alias("n_distinct_after"),
    )
    nf_b = F.col("n_nulls_before") / F.col("n_rows_before")
    nf_a = F.col("n_nulls_after") / F.col("n_rows_after")
    return (
        b.join(a, "column", "full")
        .select(
            "column",
            F.round(nf_a - nf_b, 6).alias("null_frac_delta"),
            F.round(
                F.col("n_distinct_after")
                / F.nullif(F.col("n_distinct_before").cast("double"), F.lit(0.0)),
                4,
            ).alias("distinct_ratio"),
            (F.col("n_rows_before").isNull() | F.col("n_rows_after").isNull()).alias(
                "column_added_or_dropped"
            ),
        )
        .orderBy("column")
    )
