"""Mechanical mirror of the gate-rotation contract (VERDICT r11 Next #2).

The r12 gate mislabel survived review because the due set lived only in a
hand-written comment. These tests recompute it from the CORRECTNESS_r*.json
history via gate_plan.py and assert the LIVE ``_GATE_PRIORITY`` head against
it — a wrong plan now fails the suite instead of aging 42 stale queries to
4 rounds.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import gate_plan
from iceberg_quickstart_iac_spark.plans import queries as queries_fn
from iceberg_quickstart_iac_spark.plans.queries import (
    _GATE_PRIORITY,
    _GATE_ROUND,
    _GATE_SPILL,
    _QUEUED_ADDITIONS,
    _REGISTRY,
    _RETIRED,
)

CATALOG = list(queries_fn().keys())
FIRST_50 = _GATE_PRIORITY[: gate_plan.GATE_SLOTS]
#: mid-round additions are contractually past the gate this round — the
#: due-set computations below exclude them (they lead the NEXT head)
ROTATING = [q for q in CATALOG if q not in _QUEUED_ADDITIONS]


def test_gate_names_resolve():
    """Every gate name is a registered, non-retired catalog query."""
    unknown = [q for q in _GATE_PRIORITY if q not in _REGISTRY]
    assert not unknown, f"gate names not in registry: {unknown}"
    retired_in_gate = [q for q in _GATE_PRIORITY if q in _RETIRED]
    assert not retired_in_gate, f"retired queries still in gate: {retired_in_gate}"
    assert len(set(_GATE_PRIORITY)) == len(_GATE_PRIORITY), "duplicate gate names"


def test_gate_head_is_full():
    """The driver certifies exactly the first 50 entries — with a catalog
    larger than the gate, an underfull head wastes certification slots."""
    assert len(CATALOG) >= gate_plan.GATE_SLOTS
    assert len(FIRST_50) == gate_plan.GATE_SLOTS


def test_gate_head_covers_due_set():
    """first-50 == {never-certified} ∪ {>=3-rounds-stale} ∪ free touched
    slots, with any overflow named in _GATE_SPILL (capacity policy items
    1-2). Computed from CORRECTNESS rounds BEFORE _GATE_ROUND so the
    assertion stays stable after this round's own file lands."""
    never, stale, free = gate_plan.due_set(ROTATING, _GATE_ROUND)
    due = set(never) | set(stale)
    head = set(FIRST_50)
    if free >= 0:
        missing = due - head
        assert not missing, (
            f"round-{_GATE_ROUND} gate omits {len(missing)} due queries "
            f"(never={len(never)}, stale={len(stale)}): {sorted(missing)}"
        )
        assert not _GATE_SPILL, (
            f"_GATE_SPILL names {_GATE_SPILL} but the due set fits "
            f"({len(due)} <= {gate_plan.GATE_SLOTS}) — spill is only for overflow"
        )
    else:
        spilled = due - head
        assert spilled == set(_GATE_SPILL), (
            f"overflow round: spilled {sorted(spilled)} must exactly match "
            f"_GATE_SPILL {sorted(_GATE_SPILL)}"
        )
        assert len(spilled) == -free


def test_never_certified_lead_the_gate():
    """Policy item 1: never-certified queries occupy the head positions."""
    never, _, _ = gate_plan.due_set(ROTATING, _GATE_ROUND)
    lead = _GATE_PRIORITY[: len(never)]
    assert set(lead) == set(never), (
        f"gate must LEAD with the never-certified set {sorted(never)}, got {lead}"
    )


def test_gate_round_is_current():
    """_GATE_ROUND must track the CORRECTNESS history. During a build
    session the newest file is round N-1 (gate = latest+1); in the judge's
    session this round's own file has landed (gate = latest). A gate left
    un-replanned for a whole round fails here at that round's judge run."""
    latest = gate_plan._latest_round()
    assert _GATE_ROUND in (latest, latest + 1), (
        f"_GATE_ROUND={_GATE_ROUND} but newest CORRECTNESS round is {latest} "
        f"— recompute the gate with gate_plan.py and bump _GATE_ROUND"
    )


def test_queued_additions_are_past_the_gate():
    """Mid-round additions must be registered, never certified, outside
    the first 50, and covered by an oracle (the pytest replay is their
    interim verification)."""
    hist = gate_plan.newest_green(max_round=_GATE_ROUND)
    from iceberg_quickstart_iac_spark.plans import oracle_sql

    oracles = oracle_sql(include_retired=True)
    for q in _QUEUED_ADDITIONS:
        assert q in _REGISTRY, q
        assert q not in hist, f"{q} already certified — drop it from the queue"
        assert q not in FIRST_50, f"{q} is queued past the gate but sits in the head"
        assert q in oracles, f"{q} has no oracle — rows-only interim coverage"


def test_cli_plan_matches_committed_head():
    """The CLI's plan_for (ADVICE r12 #1) must reproduce the committed
    head's due set exactly — including while a _QUEUED_ADDITIONS list is
    in force, when the raw catalog would disagree with the head."""
    never, stale, free, queued = gate_plan.plan_for(_GATE_ROUND)
    assert set(queued) == set(_QUEUED_ADDITIONS)
    due = set(never) | set(stale)
    assert due <= set(FIRST_50) or free < 0
    assert not (due & set(_QUEUED_ADDITIONS))


def test_cli_plan_excludes_queue_only_for_gate_round(monkeypatch):
    """A queued addition is exempt ONLY for the round its queue was
    declared for; at the next round it must rotate as never-certified."""
    import importlib

    qmod = importlib.import_module("iceberg_quickstart_iac_spark.plans.queries")
    name = next(iter(qmod._REGISTRY))
    monkeypatch.setattr(qmod, "_QUEUED_ADDITIONS", [name])
    hist = gate_plan.newest_green(max_round=_GATE_ROUND)
    never_now, stale_now, _, queued_now = gate_plan.plan_for(_GATE_ROUND)
    assert queued_now == [name]
    assert name not in never_now and name not in stale_now
    never_next, stale_next, _, queued_next = gate_plan.plan_for(_GATE_ROUND + 1)
    assert queued_next == []
    if name not in hist:
        assert name in never_next


# ---------------------------------------------------------------------------
# Property check of the planner itself: for ANY certification history the
# due set must obey the policy invariants — these are what make the
# hand-maintained-prose failure mode (VERDICT r11 #1) impossible to
# reintroduce through a planner edit.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    data=st.data(),
    n_queries=st.integers(min_value=1, max_value=120),
    target_round=st.integers(min_value=2, max_value=20),
)
def test_due_set_invariants(tmp_path_factory, data, n_queries, target_round):
    import json

    repo = tmp_path_factory.mktemp("hist")
    catalog = [f"q{i:03d}" for i in range(n_queries)]
    # random green/red driver rows across rounds 1..target_round+2 (rows
    # at/after target_round must be IGNORED by a plan for target_round)
    per_round: dict[int, dict] = {}
    for q in catalog:
        for rnd in data.draw(
            st.lists(
                st.integers(min_value=1, max_value=target_round + 2),
                max_size=6,
            )
        ):
            green = data.draw(st.booleans())
            per_round.setdefault(rnd, {})[q] = {
                "rows_match": green,
                "schema_match": green,
                "hash_match": green,
                "err": None if green else "boom",
            }
    for rnd, rows in per_round.items():
        (repo / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))

    hist = gate_plan.newest_green(max_round=target_round, repo=str(repo))
    never, stale, free = gate_plan.due_set(
        catalog, target_round, repo=str(repo)
    )

    # 1. partition: never ∩ stale = ∅, both ⊆ catalog
    assert not (set(never) & set(stale))
    assert set(never) <= set(catalog) and set(stale) <= set(catalog)
    # 2. never = exactly the catalog entries with no green row before
    #    target_round
    assert set(never) == {q for q in catalog if q not in hist}
    # 3. stale = exactly the certified entries aged >= MAX_AGE, oldest
    #    first (ties by name) — and no future row ever counts
    assert stale == sorted(
        (q for q in catalog if q in hist
         and target_round - hist[q] >= gate_plan.MAX_AGE),
        key=lambda q: (hist[q], q),
    )
    assert all(hist[q] < target_round for q in stale)
    # 4. slot arithmetic is exact
    assert free == gate_plan.GATE_SLOTS - len(never) - len(stale)
