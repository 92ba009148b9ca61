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


def test_comoment_cast_to_double_rounds_identically(spark, smoke_oracle):
    """Writing this test (r6 verdict #6) DISPROVED the original claim:
    DuckDB's direct HUGEINT→DOUBLE cast is NOT correctly rounded above
    2^53 (e.g. -(2^60+2^7+1) lands on a non-nearest double; ~4% of
    random wide integers diverge, more for negatives), so product-of-
    sums oracles (op_corr_matrix ~1e22, op_trend_slope determinants)
    could hash-mismatch at another scale factor. The sanctioned oracle
    idiom is therefore exprs.sql_wide_to_double — CAST(...AS VARCHAR)
    then to DOUBLE, whose strtod parse IS IEEE round-half-even. This
    test pins (a) Spark's decimal→double = Python's exact-int→double
    (round-half-even) on adversarial magnitudes, (b) DuckDB's VARCHAR
    path matching both, and (c) the known direct-cast divergence that
    forced the idiom (so a DuckDB upgrade that fixes it is noticed)."""
    from universal_data_to_orc_converter_spark.exprs import (
        sql_wide_to_double,
    )

    cases = [
        2**53 + 1,           # tie: rounds to even (2^53)
        2**53 + 3,           # tie: rounds to even (2^53 + 4)
        2**53 + 5,           # non-tie
        2**60 + 2**7 + 1,    # low bits lost
        2**62 + 3,
        2**63 - 1,           # BIGINT max (DuckDB side stays HUGEINT-safe)
        10**22 + 10**7 + 1,  # p11's real magnitude on lineitem
        10**22 + 5 * 10**5,
    ]
    for v in cases:
        for sign in (1, -1):
            x = sign * v
            py = float(x)  # Python's exact-int → double is round-half-even
            sp = spark.sql(
                f"SELECT CAST(CAST('{x}' AS DECIMAL(38,0)) AS DOUBLE) AS d"
            ).collect()[0]["d"]
            safe = sql_wide_to_double(f"CAST('{x}' AS HUGEINT)")
            du = smoke_oracle.sql(f"SELECT {safe} AS d").fetchone()[0]
            assert sp == du == py, (
                f"cast divergence at {x}: spark={sp!r} duck={du!r} py={py!r}"
            )
    # the divergence that forced the VARCHAR idiom — if this starts
    # failing, DuckDB fixed its direct cast and the idiom is optional
    bad = -(2**60 + 2**7 + 1)
    direct = smoke_oracle.sql(
        f"SELECT CAST(CAST('{bad}' AS HUGEINT) AS DOUBLE) AS d"
    ).fetchone()[0]
    assert direct != float(bad), (
        "DuckDB's direct HUGEINT->DOUBLE cast became correctly "
        "rounded — sql_wide_to_double is no longer load-bearing; "
        "update exprs.py's rationale comment"
    )
