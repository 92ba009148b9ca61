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


def effective_round(root: str = _ROOT) -> int:
    """The round the budget is enforced against: the round the window
    was rotated FOR (``registry.WINDOW_ROUND``), capped by the ledger.

    Rationale (r9 verdict "red suite at handoff"): the external driver
    commits CORRECTNESS_r{N}.json BETWEEN rounds, which bumps the
    ledger-inferred current round to N+1 before the next builder
    session has rotated the window. Enforcing the floor against the
    ledger round made the committed tree red in exactly that gap, by
    design but against the "pytest always green" bar. Enforcing against
    WINDOW_ROUND keeps the handoff tree green; window_lag() bounds how
    far the pin may trail so rotation still cannot be skipped.
    """
    from universal_data_to_orc_converter_spark.registry import WINDOW_ROUND

    _, ledger_round = load_ledger(root)
    return min(ledger_round, WINDOW_ROUND)


def window_lag(root: str = _ROOT) -> int:
    """Rounds the pinned window trails the ledger. 0 while building the
    window's own round; 1 in the between-rounds handoff gap (driver
    committed the window-round's CORRECTNESS file, builder not yet
    rotated); ≥2 means a rotation was skipped — gated red by
    tests/test_staleness_budget.py."""
    from universal_data_to_orc_converter_spark.registry import WINDOW_ROUND

    _, ledger_round = load_ledger(root)
    return ledger_round - WINDOW_ROUND


def violations(root: str = _ROOT) -> list[tuple[str, int]]:
    """Queries whose latest driver row is older than the budget floor
    and that are NOT seated in the current window (so they would not be
    refreshed this round either)."""
    from universal_data_to_orc_converter_spark.registry import (
        DRIVER_PRIORITY,
    )

    latest, _ = load_ledger(root)
    floor = budget_floor(effective_round(root))
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
    latest, _ = load_ledger(root)
    floor = budget_floor(effective_round(root))
    rows = [latest[m] for m in members if m in latest]
    return bool(rows) and min(rows) >= floor


def main() -> int:
    latest, ledger_round = load_ledger()
    current = effective_round()
    floor = budget_floor(current)
    bad = violations()
    print(
        f"staleness audit: window round r{current} (ledger r{ledger_round},"
        f" lag {window_lag()}), budget floor r{floor}, "
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
