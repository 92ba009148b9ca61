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


def test_window_lag_at_most_one_round():
    """The WINDOW_ROUND pin keeps the tree green through the
    between-rounds handoff gap (driver commits CORRECTNESS_r{N} before
    the builder rotates — lag 1). Lag ≥2 means a whole round passed
    without rotating: the budget gates below would be enforcing an
    outdated floor, so fail loudly here instead."""
    lag = staleness_audit.window_lag()
    assert 0 <= lag <= 1, (
        f"DRIVER_PRIORITY window trails the correctness ledger by {lag} "
        f"rounds — rotate it (scripts/rotate_window.py) and bump "
        f"registry.WINDOW_ROUND"
    )


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

    latest, _ = staleness_audit.load_ledger()
    next_floor = staleness_audit.budget_floor(
        staleness_audit.effective_round() + 1
    )
    window = set(DRIVER_PRIORITY)
    expiring = [
        n for n, r in latest.items() if r < next_floor and n not in window
    ]
    assert len(expiring) <= 50, (
        f"{len(expiring)} queries expire next round — more than one "
        f"window can refresh; the rotation has fallen behind: {expiring}"
    )
