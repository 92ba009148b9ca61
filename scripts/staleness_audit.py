"""Staleness-budget audit over the driver-correctness ledger.

The external driver verifies only the first 50 registry names per round
(CORRECTNESS_r{N}.json). With 237+ queries, refreshes are ≥4.7 rounds
apart at steady state, so the pinned budget is:

    **every query's latest driver row must be ≥ current_round − 5,
    or the query must be seated in the current DRIVER_PRIORITY window
    (i.e. about to be refreshed this round).**

Policy rider (manual, tracked in COVERAGE.md): an operator whose query
schema or semantics are MODIFIED after its latest green row re-seats in
the very next round's window unconditionally — a green row for a shape
that no longer exists is not evidence (the r6 `op_incremental_agg_maintain`
case).

Run:  PYTHONPATH=/root/repo python scripts/staleness_audit.py
Exits non-zero listing violations, like the freeze-proof gate does for
post-freeze registrations. `tests/test_staleness_budget.py` runs the
same check in pytest so it cannot be forgotten.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

BUDGET_ROUNDS = 5

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_ledger(root: str = _ROOT) -> tuple[dict[str, int], int]:
    """Return ({query: latest round with a driver row}, current_round).

    current_round = max correctness-file round + 1 — the round being
    built now, whose CORRECTNESS file does not exist yet.
    """
    latest: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as f:
            for name in json.load(f):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round + 1


def budget_floor(current_round: int) -> int:
    return current_round - BUDGET_ROUNDS


def violations(root: str = _ROOT) -> list[tuple[str, int]]:
    """Queries whose latest driver row is older than the budget floor
    and that are NOT seated in the current window (so they would not be
    refreshed this round either)."""
    from universal_data_to_orc_converter_spark.registry import (
        DRIVER_PRIORITY,
    )

    latest, current = load_ledger(root)
    floor = budget_floor(current)
    window = set(DRIVER_PRIORITY)
    return sorted(
        (name, rnd)
        for name, rnd in latest.items()
        if rnd < floor and name not in window
    )


def family_is_fresh(members: set[str], root: str = _ROOT) -> bool:
    """A SURVEY §2 family needs no window seat this round when every
    verified member's latest row is within the budget (the window-seat
    requirement exists to bound verification age, not for its own sake).
    """
    latest, current = load_ledger(root)
    floor = budget_floor(current)
    rows = [latest[m] for m in members if m in latest]
    return bool(rows) and min(rows) >= floor


def main() -> int:
    latest, current = load_ledger()
    floor = budget_floor(current)
    bad = violations()
    print(
        f"staleness audit: round r{current}, budget floor r{floor}, "
        f"{len(latest)} queries with driver rows"
    )
    if bad:
        print("VIOLATIONS (latest row older than budget, not in window):")
        for name, rnd in bad:
            print(f"  {name}: latest r{rnd} < floor r{floor}")
        return 1
    histogram: dict[int, int] = {}
    for rnd in latest.values():
        histogram[rnd] = histogram.get(rnd, 0) + 1
    print(f"OK — latest-round histogram: {dict(sorted(histogram.items()))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
