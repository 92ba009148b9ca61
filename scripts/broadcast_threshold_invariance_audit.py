"""Check that every registered query's RESULT is independent of
``spark.sql.autoBroadcastJoinThreshold``.

Why this matters: the r12 posture change (plans/hints.py) removed
forced broadcast hints from every corpus-proportional dimension, so
those joins' physical strategy is now decided by size statistics +
AQE. At fixture scale the stats pick broadcast; at 100 TB the same
queries plan sort-merge. This audit empirically proves the claim the
posture change rests on — **the at-scale plan shape computes the same
answers** — by running each query twice on the same fixture: ambient
threshold (10 MB default → broadcast-heavy plans, what the driver
measures) vs ``-1`` (stats-based broadcast disabled everywhere →
every un-hinted join degrades to the sort-merge/shuffle-hash shape it
would take on a 100 TB corpus), and comparing the full normalized
result multisets. Exact equality, floats included: a float that moves
with join strategy is a reduction-order dependence, the class the
fixed-point aggregation convention (pkg/exprs.py) targets.

Companion to scripts/partition_invariance_audit.py (same method, the
shuffle-partition axis); see PERF.md r12 for the recorded run.

Run:  PYTHONPATH=/root/repo python \
          scripts/broadcast_threshold_invariance_audit.py [sf_dir]
Exit 0 always (audit, not gate); failures feed fixes + regression
tests.
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def main() -> int:
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )
    from universal_data_to_orc_converter_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    key = "spark.sql.autoBroadcastJoinThreshold"
    ambient = spark.conf.get(key)
    print(f"[setup] {sf}: ambient {key}={ambient}, alt=-1")

    specs = load_all_queries()
    diff, err = [], []
    for name in sorted(specs):
        try:
            base = sorted(
                (
                    tuple(_norm(v) for v in r)
                    for r in specs[name].fn(spark, sf).collect()
                ),
                key=repr,
            )
            spark.conf.set(key, "-1")
            try:
                other = sorted(
                    (
                        tuple(_norm(v) for v in r)
                        for r in specs[name].fn(spark, sf).collect()
                    ),
                    key=repr,
                )
            finally:
                spark.conf.set(key, ambient)
            if base != other:
                diff.append(name)
                seen = {
                    i
                    for i, (a, b) in enumerate(zip(base, other))
                    if a != b
                }
                print(
                    f"[DIFF] {name}: rows {len(base)} vs {len(other)}, "
                    f"first differing idx {min(seen) if seen else 'len'}"
                )
        except Exception as e:  # noqa: BLE001 — audit wants them all
            err.append(name)
            print(
                f"[ERR] {name}: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:140]}"
            )
    print(
        f"[summary] {len(specs) - len(diff) - len(err)} invariant / "
        f"{len(diff)} strategy-dependent / {len(err)} errored of "
        f"{len(specs)}; diff={diff} err={err}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
