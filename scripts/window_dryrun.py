"""Dry-run the CURRENT driver window end-to-end, driver-style.

Complements scripts/driver_sim_audit.py (which checks every
oracle-backed query): this walks DRIVER_PRIORITY in order — exactly
the set the external driver will record rows for — runs each query
through the driver's pandas canonicalization, compares oracle-backed
names against DuckDB, and run-checks the rows-only names (the driver's
weaker rows-only path). One command replaces the ad-hoc inline
snippets the r8/r9 sessions used for the pre-freeze window check.

Usage:
    PYTHONPATH=/root/repo python scripts/window_dryrun.py \
        [sf_dir (default /root/testdata/sf0.01)]
"""

from __future__ import annotations

import os
import sys

import duckdb

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

from driver_sim_audit import canon, cells_equal  # noqa: E402

from universal_data_to_orc_converter_spark.catalog import (  # noqa: E402
    TABLES,
    table_path,
)
from universal_data_to_orc_converter_spark.registry import (  # noqa: E402
    DRIVER_PRIORITY,
    load_all_queries,
)
from universal_data_to_orc_converter_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    spark = get_spark("window-dryrun")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'")
    specs = load_all_queries()
    n_green = n_rows_only = 0
    bad: list[tuple[str, str]] = []
    for name in DRIVER_PRIORITY:
        spec = specs[name]
        try:
            sp = canon(spec.fn(spark, SF_DIR).toPandas())
        except Exception as ex:
            bad.append((name, f"CRASH: {ex!r:.160}"))
            print(f"FAIL {name}: crash {ex!r:.120}", flush=True)
            continue
        if not spec.oracle:
            n_rows_only += 1
            print(f"ok   {name} (rows-only, {len(sp)} rows)", flush=True)
            continue
        du = canon(con.sql(spec.oracle).df())
        if list(sp.columns) != list(du.columns):
            bad.append((name, f"columns {list(sp.columns)} != {list(du.columns)}"))
            continue
        if len(sp) != len(du):
            bad.append((name, f"rows {len(sp)} != {len(du)}"))
            continue
        mism = [
            c
            for c in sp.columns
            if any(
                not cells_equal(a, b)
                for a, b in zip(sp[c].to_numpy(), du[c].to_numpy())
            )
        ]
        if mism:
            bad.append((name, f"mismatched cols {mism}"))
            print(f"FAIL {name}: {mism}", flush=True)
        else:
            n_green += 1
            print(f"ok   {name}", flush=True)
    print(
        f"\nwindow: {len(DRIVER_PRIORITY)} seats — {n_green} oracle-green, "
        f"{n_rows_only} rows-only, {len(bad)} failing"
    )
    for n, r in bad:
        print(f"  {n}: {r}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
