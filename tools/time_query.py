"""Isolated per-query measurement harness (guide §1.1/§1.4).

Times a subset of catalog queries with BOTH actions (count — the bench's
primary series — and the noop sink, which computes every column), after a
sf0.001 warm-up pass, and optionally dumps ``explain("formatted")`` per
query. Exists so optimization iterations don't need the 15-minute full
bench: same session shape (local[$SPARK_GRAFT_CPUS], shuffle=cpus, same
extra conf as bench.py).

Usage:
  python tools/time_query.py q1 q2 ...           # time queries
  python tools/time_query.py --explain DIR q1 …  # also dump plans
  python tools/time_query.py --reps 3 q1 …
  SPARK_GRAFT_EXTRA_CONF='{"spark.io.compression.codec":"zstd"}' \
      python tools/time_query.py q1              # config A/B trials
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_quickstart_iac_spark import plans
from iceberg_quickstart_iac_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir to dump plans into")
    ap.add_argument("--suffix", default="", help="plan filename suffix (_before/_after)")
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    extra.setdefault("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark = get_spark(
        app_name="time_query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    catalog = plans.queries()
    missing = [n for n in args.names if n not in catalog]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    if not args.no_warm:
        for n in args.names:
            try:
                catalog[n](spark, "/root/testdata/sf0.001").count()
            except Exception as exc:  # warm-up failures surface in timing runs
                print(f"warmup {n}: {type(exc).__name__}: {exc}", file=sys.stderr)

    out: dict[str, dict] = {}
    for n in args.names:
        cnt, nop = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            catalog[n](spark, sf_dir).count()
            cnt.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        if not args.no_noop:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                catalog[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
                nop.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        out[n] = {
            "count_min": round(min(cnt), 3),
            "count_all": [round(t, 3) for t in cnt],
            **(
                {"noop_min": round(min(nop), 3), "noop_all": [round(t, 3) for t in nop]}
                if nop
                else {}
            ),
        }
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = catalog[n](spark, sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain, f"{n}{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
