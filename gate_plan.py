"""Mechanical gate-list planner: recomputes the driver-certification due
set from the CORRECTNESS_r*.json history so the 50-slot rotation in
``_GATE_PRIORITY`` can never silently name the wrong queries again
(VERDICT r11 Next #2 — the r12 mislabel happened because the due set was
hand-maintained prose).

Contract encoded here (COVERAGE.md "Gate capacity policy"):

1. Queries that have NEVER had a green driver row lead the gate.
2. Then every query whose newest green row is >= 3 rounds old at the
   target round (the steady-state maximum certification age).
3. Remaining slots are free for round-touched re-certifications.
4. If (1)+(2) exceed 50 slots, the overflow must be NAMED in
   ``_GATE_SPILL`` and becomes the next round's lead.

Retired queries (pytest-oracle-only coverage) are exempt from rotation.

Usage:  python gate_plan.py [--round N]   # prints the due-set plan
The pytest mirror (tests/test_gate_plan.py) asserts the live
``_GATE_PRIORITY`` head against this computation.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.abspath(__file__))

#: a driver row only counts as certification when ALL THREE checks hold
#: and the driver recorded no harness error
_GREEN = ("rows_match", "schema_match", "hash_match")

#: steady-state maximum certification age (rounds) before a query is due
MAX_AGE = 3

GATE_SLOTS = 50


def newest_green(max_round: int | None = None, repo: str = REPO) -> dict[str, int]:
    """Newest round with a fully-green driver row, per query.

    ``max_round`` bounds the files considered (exclusive of later rounds)
    so a gate written FOR round N stays checkable after round N's own
    CORRECTNESS file lands — pass ``N`` to reproduce the planning state.
    """
    hist: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd >= max_round:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if all(row.get(k) for k in _GREEN) and not row.get("err"):
                hist[name] = max(hist.get(name, 0), rnd)
    return hist


def due_set(
    catalog: list[str], target_round: int, repo: str = REPO
) -> tuple[list[str], list[str], int]:
    """(never_certified, stale, free_slots) for ``target_round``.

    ``catalog`` is the ACTIVE driver catalog (retired entries excluded by
    the caller). ``free_slots`` may be negative — that is the spill count
    the policy requires to be named in ``_GATE_SPILL``.
    """
    hist = newest_green(max_round=target_round, repo=repo)
    never = [q for q in catalog if q not in hist]
    stale = sorted(
        (q for q in catalog if q in hist and target_round - hist[q] >= MAX_AGE),
        key=lambda q: (hist[q], q),
    )
    free = GATE_SLOTS - len(never) - len(stale)
    return never, stale, free


def plan_for(
    target: int, repo: str = REPO
) -> tuple[list[str], list[str], int, list[str]]:
    """(never, stale, free_slots, queued) for the live catalog at
    ``target``. Mid-round additions (``_QUEUED_ADDITIONS``) are
    contractually PAST the gate for the round their queue was declared
    for — excluding them here makes the CLI reproduce the committed head
    exactly while a queue is in force (ADVICE r12 #1); for any other
    target round they rotate normally (as never-certified leads)."""
    import importlib

    queries_mod = importlib.import_module(
        "iceberg_quickstart_iac_spark.plans.queries"
    )
    catalog = list(queries_mod.queries().keys())
    queued: list[str] = []
    if target == queries_mod._GATE_ROUND:
        queued = [q for q in queries_mod._QUEUED_ADDITIONS if q in catalog]
        catalog = [q for q in catalog if q not in queued]
    never, stale, free = due_set(catalog, target, repo=repo)
    return never, stale, free, queued


def _latest_round(repo: str = REPO) -> int:
    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) if rounds else 0


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--round",
        type=int,
        default=None,
        help="target gate round (default: newest CORRECTNESS round + 1)",
    )
    args = parser.parse_args()
    target = args.round if args.round is not None else _latest_round() + 1
    never, stale, free, queued = plan_for(target)
    hist = newest_green(max_round=target)

    print(f"# gate plan for round {target} ({GATE_SLOTS} slots)")
    print(f"# never certified ({len(never)}):")
    for q in never:
        print(f"    {q!r},")
    print(f"# stale (newest green row <= r{target - MAX_AGE}) ({len(stale)}):")
    for q in stale:
        print(f"    {q!r},  # r{hist[q]}")
    if free >= 0:
        print(f"# {free} free slot(s) for round-touched re-certifications")
    else:
        print(f"# OVERFLOW: name {-free} spill(s) in _GATE_SPILL (policy item 2)")
    if queued:
        print(f"# queued past the gate this round ({len(queued)}):")
        for q in queued:
            print(f"    {q!r},  # leads the round-{target + 1} head")


if __name__ == "__main__":
    main()
