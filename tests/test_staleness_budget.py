"""The r6 verdict found 70 queries whose latest driver row was three or
more rounds old, drifting silently. Pin the staleness budget as a test:
every query's latest CORRECTNESS row must be within BUDGET_ROUNDS of the
current round, or the query must be seated in the current window (about
to be refreshed). scripts/staleness_audit.py is the same check as a CLI.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

import staleness_audit  # noqa: E402


def test_ledger_loads():
    latest, current = staleness_audit.load_ledger()
    assert current >= 7
    assert len(latest) >= 215


def test_no_query_exceeds_staleness_budget():
    bad = staleness_audit.violations()
    assert not bad, (
        f"queries past the staleness budget and not seated in the "
        f"current window: {bad} — rotate them into DRIVER_PRIORITY"
    )


def test_window_covers_next_rounds_expiring_names():
    """Look one round ahead: names that will fall below the floor NEXT
    round must either be in THIS round's window (refreshed now) or few
    enough to fit next round's rotation alongside the below-fold queue.
    This catches the tail before it becomes a violation."""
    from universal_data_to_orc_converter_spark.registry import (
        DRIVER_PRIORITY,
    )

    latest, current = staleness_audit.load_ledger()
    next_floor = staleness_audit.budget_floor(current + 1)
    window = set(DRIVER_PRIORITY)
    expiring = [
        n for n, r in latest.items() if r < next_floor and n not in window
    ]
    assert len(expiring) <= 50, (
        f"{len(expiring)} queries expire next round — more than one "
        f"window can refresh; the rotation has fallen behind: {expiring}"
    )
