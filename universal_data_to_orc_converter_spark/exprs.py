"""Shared column expressions enforcing the oracle-exactness conventions.

Float addition is not associative, so a raw double ``SUM`` differs
between engines (and between runs, as partition interleaving changes).
Every sum over a double column therefore goes through an exact integer
representation:

    per row:  FLOOR(x * 10^6 + 0.5)       -- pure FP ops, deterministic
    Spark:    CAST(... AS DECIMAL(18,0))  -- long-backed, cheap cast
    sum:      exact integer accumulation (decimal(28,0) / hugeint —
              no overflow at 100 TB row counts)
    finally:  CAST(sum AS DOUBLE) / 1e6   -- same two ops both engines

Both engines execute the identical FP scaling per row and the
identical final conversion, so results are bit-identical. Fixture
money/measure columns carry ≤6 decimal digits (2dp values and products
of up to three of them), so the 10^6 scaling is lossless.

Why not ``CAST(x AS DECIMAL(18,6))`` directly? Same semantics, but
Spark's double→decimal cast routes through ``BigDecimal.valueOf`` —
measured ~4× slower per aggregate than the scaled-integer path. Why
not ONE scaled ``BIGINT`` sum? 6× faster than decimal-cast too, but a
long accumulator overflows around Σ|x| ≈ 9·10¹² — real at 100 TB.

The accumulation therefore splits the scaled long into three limbs
(arithmetic shift + mask, all codegen'd long ops — no per-row Decimal
allocation) and sums each limb as a plain ``BIGINT``:

    limb0 = x & (2^18-1)          ∈ [0, 2^18)
    limb1 = (x >> 18) & (2^18-1)  ∈ [0, 2^18)
    limb2 = x >> 36               ∈ [-2^17, 2^17]   for |x| ≤ 2^53

(identity: x = (x>>36)·2^36 + ((x>>18)&m)·2^18 + (x&m), exact for
negatives too — ``>>`` is arithmetic/floor shift and ``&`` yields the
matching non-negative remainder). Each limb sum is bounded by
n·2^18 ≤ 2^63 ⇒ safe for n ≤ 2^45 ≈ 3.5·10¹³ rows — ~58× the row
count of a 100 TB lineitem — with zero silent-wrap risk inside that
bound. The three limb sums are recombined ONCE PER GROUP in
decimal(38,0) (exact: |total| ≤ n·2^53 = 2^98 < 10^38), giving the
identical integer the old decimal(18,0)-fed sum produced, then the
identical final ``CAST(… AS DOUBLE) / 10^6``. Measured on the Q1
headliner (r15): 0.69–1.0 s (decimal sums) → 0.42 s (limb sums),
values bit-identical at all scales.

Averages divide the exact sum by the count in the same order on both
sides. Window/running sums (small frames) keep the simpler decimal
cast. ``davg`` and ``dsum`` require |x·10⁶| < 2⁵³ per row (any
realistic money/metric value) and < 2⁴⁵ rows per group.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed-point scale: 6 decimal digits
_SCALE = 1_000_000

#: limb width for the split-long exact sum (see module docstring)
_LIMB_BITS = 18
_LIMB_MASK = (1 << _LIMB_BITS) - 1


def _scaled(col: Column) -> Column:
    """Exact fixed-point representation of a ≤6-decimal double, as a
    long-backed decimal(18,0). Used by window/running sums and the
    mergeable-state ops (small frames / per-key partials, where the
    limb split below isn't worth the extra aggregate columns)."""
    return F.floor(col * _SCALE + F.lit(0.5)).cast("decimal(18,0)")


def _scaled_long(col: Column) -> Column:
    """Exact fixed-point representation of a ≤6-decimal double, as a
    plain BIGINT (FLOOR returns long)."""
    return F.floor(col * _SCALE + F.lit(0.5))


def _exact_sum(col: Column) -> Column:
    """Exact Σ FLOOR(x·10⁶ + 0.5) via three overflow-proof BIGINT limb
    sums, recombined per group in decimal(38,0). Bit-identical to a
    decimal-accumulated sum (same integer), ~2× faster per row."""
    x = _scaled_long(col)
    s2 = F.sum(F.shiftright(x, 2 * _LIMB_BITS))
    s1 = F.sum(F.shiftright(x, _LIMB_BITS).bitwiseAND(F.lit(_LIMB_MASK)))
    s0 = F.sum(x.bitwiseAND(F.lit(_LIMB_MASK)))
    return (
        s2.cast("decimal(38,0)") * F.lit(1 << (2 * _LIMB_BITS))
        + s1.cast("decimal(38,0)") * F.lit(1 << _LIMB_BITS)
        + s0.cast("decimal(38,0)")
    )


def dsum(col: Column, alias: str) -> Column:
    """Order-independent exact sum of a double column, as double."""
    return (_exact_sum(col).cast("double") / float(_SCALE)).alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Average as exact-sum / count — both engines divide the same
    numbers in the same order, so the double result is identical."""
    return (
        _exact_sum(col).cast("double") / float(_SCALE) / F.count(col)
    ).alias(alias)


def revenue() -> Column:
    """TPC-H style revenue term: extendedprice * (1 - discount)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# SQL fragments mirroring the above for oracle strings. DuckDB's
# BIGINT sum widens to HUGEINT — exact like Spark's decimal(28,0).
# The final integer→double conversion goes THROUGH VARCHAR: DuckDB's
# direct HUGEINT→DOUBLE cast is not correctly rounded (measured: ~4%
# of random >2^53 integers land on a non-nearest double, more for
# negatives), while its string→double parse is IEEE
# round-half-even — matching Spark's decimal→double and Java's
# long→double exactly. Within 2^53 both paths agree, so this is free
# insurance for the small-SF driver gate and REQUIRED for
# product-of-sums magnitudes (see op_corr_matrix, ~1e22).
def sql_wide_to_double(expr: str) -> str:
    """Correctly-rounded DuckDB cast of an exact wide integer (BIGINT/
    HUGEINT/DECIMAL) expression to DOUBLE."""
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    s = f"SUM(CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT))"
    return f"{sql_wide_to_double(s)} / 1000000.0 AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    s = f"SUM(CAST(FLOOR(({expr}) * 1000000 + 0.5) AS BIGINT))"
    return f"{sql_wide_to_double(s)} / 1000000.0 / COUNT({expr}) AS {alias}"
