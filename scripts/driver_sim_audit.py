"""Driver-canonicalization audit.

The external driver canonicalizes results with pandas:
column-sort → sort_values over ALL columns → value hash. That is
STRICTER than tests/conftest.py's repr-sort (r4's op_embedding_quantize
passed locally and crashed the driver on an unhashable list cell).
This script runs EVERY oracle-backed query through a faithful replica
of that pipeline at sf0.01 and reports crash/mismatch per query.
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

from universal_data_to_orc_converter_spark.catalog import TABLES, table_path
from universal_data_to_orc_converter_spark.registry import load_all_queries
from universal_data_to_orc_converter_spark.session import get_spark

import os

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    try:
        if pd.isna(a) or pd.isna(b):  # None / NaN / NaT, any dtype
            return bool(pd.isna(a)) and bool(pd.isna(b))
    except (TypeError, ValueError):
        pass  # pd.isna on lists/arrays — fall through
    import datetime

    # Spark DATE → datetime.date objects; DuckDB DATE → datetime64
    # at midnight. Same logical value — coerce both to Timestamp.
    if isinstance(
        a, (datetime.date, datetime.datetime, np.datetime64, pd.Timestamp)
    ) or isinstance(
        b, (datetime.date, datetime.datetime, np.datetime64, pd.Timestamp)
    ):
        return pd.Timestamp(a) == pd.Timestamp(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b) or (
                math.isnan(float(a)) and math.isnan(float(b))
            )
        except (TypeError, ValueError):
            return False
    return a == b


def main() -> int:
    spark = get_spark("driver-sim-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_DIR, t)}'"
        )
    specs = load_all_queries()
    bad = []
    n_checked = 0
    for name, spec in specs.items():
        if not spec.oracle:
            continue
        n_checked += 1
        try:
            sp = canon(spec.fn(spark, SF_DIR).toPandas())
            du = canon(con.sql(spec.oracle).df())
        except Exception as ex:  # the r4 failure mode
            bad.append((name, f"CANONICALIZE CRASH: {ex!r:.200}"))
            print(f"FAIL {name}: crash {ex!r:.120}", flush=True)
            continue
        if list(sp.columns) != list(du.columns):
            bad.append((name, f"columns {list(sp.columns)} != {list(du.columns)}"))
            continue
        if len(sp) != len(du):
            bad.append((name, f"rows {len(sp)} != {len(du)}"))
            continue
        mism = 0
        for c in sp.columns:
            av, bv = sp[c].to_numpy(), du[c].to_numpy()
            for i in range(len(av)):
                if not cells_equal(av[i], bv[i]):
                    mism += 1
                    if mism <= 3:
                        print(f"  {name}.{c}[{i}]: {av[i]!r} != {bv[i]!r}")
                    break
        if mism:
            bad.append((name, f"{mism} column(s) mismatched"))
            print(f"FAIL {name}: {mism} mismatched col(s)", flush=True)
        else:
            print(f"ok   {name}", flush=True)
    print(f"\n{n_checked} checked, {len(bad)} failing")
    for n, r in bad:
        print(f"  {n}: {r}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
