"""Benchmark runner: every catalog query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-count via a cheap
``count()`` action over the final result). A warm-up pass on sf0.001 JIT-warms
the JVM and primes the parquet footer cache so timings reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_quickstart_iac_spark import plans
from iceberg_quickstart_iac_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.sql.legacy.parquet.nanosAsLong": "true"},
    )
    catalog = plans.queries()

    # warm-up: JVM JIT + codegen caches, tiny data
    for fn in catalog.values():
        try:
            fn(spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    # best-of-N per query: JVM/GC timing noise on a shared box is ±60% for
    # sub-second queries; the min is the stable signal
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    for name, fn in catalog.items():
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
