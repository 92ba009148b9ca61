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


def test_handoff_gap_stays_green_and_skipped_rotation_goes_red(tmp_path):
    """End-to-end check of the WINDOW_ROUND design at the one state the
    committed repo is never in while tests run: the between-rounds gap.
    Simulate ledgers in a temp root against the REAL registry pin
    (WINDOW_ROUND = W):

    * ledger max = W-1 (building W, rotation done): lag 0, floor
      enforced at W — the r9-era behavior, unchanged.
    * ledger max = W (driver just committed CORRECTNESS_r{W}): lag 1,
      floor still enforced at W — names that aged out exactly at the
      boundary do NOT violate, so the handoff tree is green (this is
      the state that made the r9 handoff suite red).
    * ledger max = W+1 (a whole round passed without rotating): lag 2
      — the lag gate fails, so the budget can never silently loosen.
    """
    import json

    from universal_data_to_orc_converter_spark.registry import (
        DRIVER_PRIORITY,
        WINDOW_ROUND,
    )

    W = WINDOW_ROUND
    stale_name = "synthetic_op_not_in_window"
    assert stale_name not in DRIVER_PRIORITY

    def write_ledger(max_round: int) -> str:
        root = tmp_path / f"ledger_{max_round}"
        root.mkdir()
        # the stale name's latest row is exactly at the floor for W:
        # fresh while the window round is W, one-past-floor at W+1
        stale_round = W - staleness_audit.BUDGET_ROUNDS
        (root / f"CORRECTNESS_r{stale_round}.json").write_text(
            json.dumps({stale_name: {"rows_match": True}})
        )
        (root / f"CORRECTNESS_r{max_round}.json").write_text(
            json.dumps({n: {"rows_match": True} for n in DRIVER_PRIORITY})
        )
        return str(root)

    # building round W (rotation committed): green
    root = write_ledger(W - 1)
    assert staleness_audit.window_lag(root) == 0
    assert staleness_audit.violations(root) == []

    # handoff gap (driver committed r{W}): still green at the same floor
    root = write_ledger(W)
    assert staleness_audit.window_lag(root) == 1
    assert staleness_audit.violations(root) == [], (
        "the handoff gap flagged boundary-aged names — the r9 "
        "red-at-handoff failure mode is back"
    )

    # skipped rotation: the lag gate must go red
    root = write_ledger(W + 1)
    assert staleness_audit.window_lag(root) == 2
