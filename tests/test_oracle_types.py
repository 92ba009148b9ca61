"""Oracle result-type safety (driver-gate hardening).

The driver hashes both result sets after a pandas/Arrow conversion, so
types that round-trip lossily through pandas break the hash even when
``fetchall()`` values compare equal. Round 2's only red driver row
(``op_pack_sequences``) was exactly this: DuckDB's ``SUM(BIGINT)``
returns HUGEINT, which pandas renders as float64 (``1234.0`` vs
Spark's ``1234``). ``tests/test_oracle.py`` compares Python-native
values and cannot see it — this test can.

Every oracle's DuckDB result types must come from the pandas-exact
set below, and integer/floating kinds must agree with the Spark
result schema column-by-column.
"""

from __future__ import annotations

import pytest

from universal_data_to_orc_converter_spark.registry import load_all_queries

from .conftest import SF_SMOKE

SPECS = load_all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)

# DuckDB types whose pandas representation is exact and matches the
# Spark-side Arrow representation. Notably ABSENT: HUGEINT (→ float64),
# unsigned ints (→ widened), DECIMAL (→ object/Decimal vs Spark float).
SAFE_DUCK_TYPES = {
    "BOOLEAN",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BLOB",
}


def _base_type(t: str) -> str:
    """Strip list/struct wrappers down to the outer constructor name."""
    t = str(t)
    return t.split("(")[0].split("[")[0].strip()


@pytest.fixture(scope="module")
def smoke_oracle():
    import duckdb

    from universal_data_to_orc_converter_spark.catalog import (
        TABLES,
        table_path,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF_SMOKE, t)}'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_types_pandas_safe(smoke_oracle, name):
    rel = smoke_oracle.sql(SPECS[name].oracle)
    for col, ty in zip(rel.columns, rel.types):
        base = _base_type(ty)
        if base in ("STRUCT", "MAP"):
            # Nested values hash through their repr; element types are
            # covered by the value comparison in test_oracle.py.
            continue
        inner = _base_type(str(ty).replace("[]", "")) if "[]" in str(
            ty
        ) else base
        assert inner in SAFE_DUCK_TYPES, (
            f"{name}.{col}: DuckDB type {ty} is not pandas-exact — "
            "cast it (HUGEINT comes from SUM(BIGINT); wrap in "
            "CAST(... AS BIGINT))"
        )
