"""Compute the next round's DRIVER_PRIORITY window mechanically.

The rotation policy (COVERAGE.md "Driver correctness-window
ordering") is formulaic: flagship first, then any RED rows from the
latest CORRECTNESS file, then ops MODIFIED after their latest green
row (passed via --modified), then every name in the current
BELOW_FOLD_R{N} set (never driver-verified), then the stalest
previously-verified names until the 50 seats fill — with overflow
going below-fold for the next round. This script prints the proposed
tuple as paste-ready Python plus the checks a rotation must satisfy
(seat count, staleness budget after the rotation, family coverage
under the budget-fallback rule).

Usage:
    PYTHONPATH=/root/repo python scripts/rotate_window.py \
        [--modified op_a op_b] [--seats 50]

It PROPOSES; the builder pastes into registry.py and renames the
below-fold constant — the freeze gate and the staleness tests then
verify the result.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

import staleness_audit  # noqa: E402

FLAGSHIP = "flagship_revenue_by_nation"


def latest_reds() -> list[str]:
    paths = sorted(
        glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not paths:
        return []
    with open(paths[-1]) as f:
        rows = json.load(f)
    return [
        n
        for n, v in rows.items()
        if v.get("err") not in (None, "no_oracle")
        or v.get("rows_match") is False
        or v.get("schema_match") is False
        or v.get("hash_match") is False
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modified", nargs="*", default=[])
    ap.add_argument("--seats", type=int, default=50)
    args = ap.parse_args()

    import universal_data_to_orc_converter_spark.registry as reg

    specs = reg.load_all_queries()
    reg_order = {n: i for i, n in enumerate(reg.QUERIES)}
    latest, current = staleness_audit.load_ledger()
    below_fold = sorted(
        (n for n in dir(reg) if n.startswith("BELOW_FOLD_R")),
        key=lambda n: int(n.rsplit("R", 1)[1]),
    )
    bf_name = below_fold[-1]
    bf = sorted(getattr(reg, bf_name), key=reg_order.get)

    window: list[str] = [FLAGSHIP]

    def seat(names, why):
        for n in names:
            if n not in window and n in specs:
                window.append(n)
                reasons[n] = why

    reasons: dict[str, str] = {FLAGSHIP: "flagship"}
    seat(latest_reds(), "RED in latest CORRECTNESS")
    seat(args.modified, "modified after green row")
    seat(bf, f"never verified ({bf_name})")
    # stalest previously-verified names, oldest round first then
    # registration order
    stale = sorted(
        (n for n in latest if n in specs),
        key=lambda n: (latest[n], reg_order.get(n, 1 << 30)),
    )
    seat(stale, "stale refresh")

    proposed, overflow = window[: args.seats], window[args.seats:]
    # overflow legitimacy: only stale-refresh names may wait
    bad_overflow = [n for n in overflow if reasons[n] != "stale refresh"]

    print(f"# proposed DRIVER_PRIORITY for round r{current} "
          f"({len(proposed)} seats)")
    print("DRIVER_PRIORITY: tuple[str, ...] = (")
    for n in proposed:
        print(f'    "{n}",  # {reasons[n]}')
    print(")")
    # only never-verified overflow needs a below-fold tag — verified
    # stale names wait in the ledger without one
    nxt = [n for n in overflow if n not in latest]
    print(f"\n# REMEMBER: set registry.WINDOW_ROUND = {current} in the "
          f"same commit (the staleness gates enforce the floor against "
          f"it; lag >1 behind the ledger is a test failure)")
    print(f"# never-verified overflow needing BELOW_FOLD_R{current} "
          f"tags: {nxt or 'none'}")
    print(f"# ({len(overflow) - len(nxt)} verified stale names also "
          f"wait, tracked by the ledger alone)")

    ok = True
    if bad_overflow:
        ok = False
        print(f"FAIL: non-stale names overflowed: {bad_overflow}")
    floor = staleness_audit.budget_floor(current)
    violat = [
        n
        for n, r in latest.items()
        if r < floor and n not in proposed
    ]
    if violat:
        ok = False
        print(f"FAIL: budget violations left outside the window: {violat}")
    print(f"# checks: seats={len(proposed)}, overflow={len(overflow)}, "
          f"budget floor r{floor}, {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
