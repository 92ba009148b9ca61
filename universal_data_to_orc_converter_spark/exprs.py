"""Shared column expressions enforcing the oracle-exactness conventions.

Float addition is not associative, so a raw double ``SUM`` differs
between engines (and between runs, as partition interleaving changes).
Every sum over a double column therefore goes through an exact decimal:
per-row ``CAST(x AS DECIMAL(18,6))`` → decimal SUM (exact,
order-independent) → ``CAST(... AS DOUBLE)``. The oracle SQL writes the
same three steps, so both engines produce bit-identical doubles.

The per-row double→decimal cast is itself deterministic: fixture money
columns carry ≤2 decimal digits and products of two such values carry
≤4, so rounding to scale 4 recovers the exact decimal value in both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column, alias: str) -> Column:
    """Order-independent exact sum of a double column, as double."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Average as exact-decimal-sum / count — both engines divide the
    same two numbers, so the double result is identical."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


def revenue() -> Column:
    """TPC-H style revenue term: extendedprice * (1 - discount), decimal."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)


# SQL fragments mirroring the above for oracle strings.
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )


SQL_REVENUE = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"
