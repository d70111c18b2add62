#!/usr/bin/env python
"""Write .explain('formatted') for every gate query to a directory.

Usage: python tools/capture_plans.py <outdir> [suffix] [query ...]
Used for the plans/r19/<query>_before.txt / _after.txt deliverables and
for load-independent plan audits (Exchange counts, join strategies,
PushedFilters, BatchEvalPython nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from etl_instagram_spark.session import get_spark

    spark = get_spark("plans")
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
