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
