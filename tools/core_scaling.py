"""Core-count scaling artifact (VERDICT r14 Next #5).

The driver's PERF scaling probe reruns the bench at a lower core count at
sf0.1 — 17 MB of data where nearly every query is sub-second and dominated
by fixed plan/stage overhead, so 8-vs-32-core ratios read ≈1.0 and
`suspect_cpus_ignored` fires even though bench.py demonstrably honors
``$SPARK_GRAFT_CPUS`` (BENCH_r14_c8.json). This tool measures core scaling
where work actually dominates overhead: the high-work funnel workloads of
``scale_sweep.py --suite funnelfix`` at a factor× corpus, run in SEPARATE
processes at each core count (a Spark master is fixed per JVM), best-of-N
per cell.

Usage:
  python tools/core_scaling.py [--factor 30] [--cpus 8,32] [--runs 2] \
      [--out SCALING_r15.json]

Writes one JSON artifact: per workload the seconds at each core count and
the low/high ratio — the evidence that the engine parallelizes when there
is anything to parallelize.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_sweep(cpus: int, factor: int, runs: int, suite: str) -> dict:
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scale_sweep.py"),
            "--suite", suite,
            "--factors", str(factor),
            "--runs", str(runs),
            "--keep",  # reuse the corpus across the per-core-count runs
            "--warmup",
        ],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in scale_sweep output:\n{proc.stdout[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=30)
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--suite", default="funnelfix")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r15.json"))
    args = ap.parse_args()
    cpu_list = sorted(int(c) for c in args.cpus.split(","))

    per_cpus: dict[int, dict] = {}
    for c in cpu_list:
        print(f"== sweep at {c} cores ==", file=sys.stderr)
        per_cpus[c] = run_sweep(c, args.factor, args.runs, args.suite)

    lo, hi = cpu_list[0], cpu_list[-1]
    f = str(args.factor)
    out = {
        "metric": "core_scaling",
        "suite": args.suite,
        "factor": args.factor,
        "runs": args.runs,
        "cpus": cpu_list,
        "per_workload": {},
    }
    for w, per_factor in per_cpus[hi]["sec"].items():
        lo_s = per_cpus[lo]["sec"][w][f]
        hi_s = per_factor[f]
        out["per_workload"][w] = {
            f"sec_c{lo}": lo_s,
            f"sec_c{hi}": hi_s,
            "ratio": round(lo_s / hi_s, 2) if hi_s else None,
            "rows": per_cpus[hi]["rows"][w][f],
        }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
