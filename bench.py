"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print a
single JSON line with per-query wall-clock seconds.

Each query is forced end-to-end with the ``noop`` sink (full execution,
no driver-side collect). One warm-up pass of the flagship query pays
JVM/codegen startup so numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from nyc_taxi_data_engineering_spark.queries import bench_queries  # noqa: E402
from nyc_taxi_data_engineering_spark.session import get_spark  # noqa: E402


def run_query(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    qs = bench_queries()

    # Warm-up: JVM JIT + codegen + parquet footer caches.
    warm = qs.get("daily_vendor_revenue") or next(iter(qs.values()))
    run_query(warm, spark, sf_dir)

    timings: dict[str, float] = {}
    for name in sorted(qs):
        timings[name] = round(run_query(qs[name], spark, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
