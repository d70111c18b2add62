"""Custom stateful / grouped Python operators (SURVEY §2.10):
``applyInPandas`` (grouped-map) and ``applyInPandasWithState``
(arbitrary streaming state).

The reference's only stateful behavior is driver-side counters and the
circuit-breaker flag (A5/E1); these operators provide the engine-grade
generalization: per-key running aggregates that survive across
micro-batches via the state store, and per-group batch transforms that
need whole-group context (normalization, ranking against group stats).

Scale notes: both operators shuffle once on the grouping key; state per
key is O(1) (the running counters), so the state store grows with key
cardinality only. Arrow moves each group/batch — keep groups bounded
(high-cardinality keys), never group by a constant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def user_event_totals_batch(events: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas: per-user totals plus each event's value
    z-score against ITS OWN user's distribution — whole-group context a
    plain window could express, shown here as the pandas escape hatch for
    logic that genuinely needs numpy/pandas."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=0) or 1.0
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "z": (pdf["value"] - mu) / sigma,
            }
        )

    return events.groupBy("user_id").applyInPandas(
        per_user, schema="user_id long, event_id long, value double, z double"
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """applyInPandasWithState: per-user running (count, sum) maintained in
    the state store across micro-batches — the streaming generalization of
    the reference's run counters (A5)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
