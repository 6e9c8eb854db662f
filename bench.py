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
    # best-of-N with WHOLE-CATALOG sweeps (not back-to-back reps of one
    # query): a transient GC/CPU stall then lands on the same query in at
    # most one sweep, so the per-query min across sweeps filters it out
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {name: float("inf") for name in catalog}
    for _ in range(repeats):
        for name, fn in catalog.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            timings[name] = min(timings[name], time.perf_counter() - t0)
            # queries that .cache() intermediates would otherwise accumulate
            # storage across 48 queries x sweeps in this one JVM — the
            # memory pressure + GC stalls show up as 10x outliers later
            spark.catalog.clearCache()
    timings = {name: round(t, 4) for name, t in timings.items()}

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
