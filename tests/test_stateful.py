"""Tests for grouped-map applyInPandas and applyInPandasWithState."""

from __future__ import annotations

import json

from etl_instagram_spark.streaming.stateful import running_user_totals, user_event_totals_batch


def test_grouped_map_zscore(spark):
    events = spark.createDataFrame(
        [(1, 10, 1.0), (2, 10, 3.0), (3, 10, 5.0), (4, 20, 7.0)],
        "event_id long, user_id long, value double",
    )
    rows = {r["event_id"]: r for r in user_event_totals_batch(events).collect()}
    assert abs(rows[1]["z"] + 1.2247448) < 1e-6  # (1-3)/std([1,3,5])
    assert rows[2]["z"] == 0.0
    assert rows[4]["z"] == 0.0  # single-event group → sigma fallback


def test_running_totals_state_across_microbatches(spark, tmp_path):
    landing = tmp_path / "ev"
    landing.mkdir()
    for i, rows in enumerate(
        [
            [{"user_id": 1, "value": 2.0}, {"user_id": 2, "value": 1.0}],
            [{"user_id": 1, "value": 3.0}],
        ]
    ):
        with open(landing / f"b{i}.json", "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .json(str(landing))
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends each update; the LAST row per
    # user reflects accumulated state across both micro-batches
    rows = spark.sql("SELECT * FROM running_totals").collect()
    last = {}
    for r in rows:
        last[r["user_id"]] = (r["n_events"], r["sum_value"])
    assert last[1] == (2, 5.0)  # state carried across micro-batches
    assert last[2] == (1, 1.0)
