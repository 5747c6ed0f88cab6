#!/usr/bin/env python
"""Benchmark harness: runs every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:  {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}

Per-query time is wall time of execution (df.count() forces the full
plan) measured after the shared SparkSession is up — session startup is
amortized across the suite, matching BASELINE.md's interpretation.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from nba_spurs_etl_spark.plans.catalog import queries
    from nba_spurs_etl_spark.session import get_spark

    spark = get_spark("nba-spurs-etl-spark-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm executors

    timings: dict[str, float] = {}
    for name, fn in queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # keep the suite going; surface on stderr
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
