"""Check that every registered query's RESULT is independent of
``spark.sql.shuffle.partitions``.

Why this matters: the driver (and any real cluster) runs the engine
under its own parallelism — local fixtures use 32, a 1000-executor
cluster uses thousands. Any op whose visible output shifts with the
shuffle partition count (per-partition sampling leaking into results,
double-sum reduction order, partition-count-dependent candidate
generation) hash-mismatches the moment the session is sized
differently, which is exactly the failure the repo's fixed-point
aggregation discipline (pkg/exprs.py) exists to prevent. This audit
measures the discipline instead of assuming it.

Method: run each query twice on the same fixture — ambient shuffle
partitions (32 via tune_session) vs a deliberately awkward 5 — and
compare the full normalized result multisets. Exact equality, floats
included: a float that moves with partition count is a reduction-
order dependence, the class the fixed-point convention targets.

Run:  PYTHONPATH=/root/repo python scripts/partition_invariance_audit.py \
          [sf_dir] [alt_partitions]
Exit 0 always (audit, not gate); failures feed fixes + regression
tests, see PERF.md.
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
    alt = sys.argv[2] if len(sys.argv) > 2 else "5"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    key = "spark.sql.shuffle.partitions"
    ambient = spark.conf.get(key)
    print(f"[setup] {sf}: ambient {key}={ambient}, alt={alt}")

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
            spark.conf.set(key, alt)
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
        f"{len(diff)} partition-dependent / {len(err)} errored of "
        f"{len(specs)}; diff={diff} err={err}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
