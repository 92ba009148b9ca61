"""Z-order (Morton-interleaved) clustered writes — multi-column data
skipping, SURVEY.md §2.A extension.

The reference writes ORC in arrival order (data_to_orc_converter.sh:245
pages rows out exactly as the source returns them), so its files carry
no usable min/max structure: a predicate on any column still decodes
every stripe. A single-column sort fixes that for ONE column only.
Z-ordering fixes it for several: quantize each clustering column to a
16-bit rank, interleave the bits into one Morton code, range-partition
and sort by that code, and every output file covers a compact
hyper-rectangle of the key space — so the per-file (and per-stripe)
min/max envelopes are tight on EVERY clustering column, and a
selective predicate on any one of them skips most files.

This is the same layout trick behind Delta's ``OPTIMIZE ZORDER BY``
and ClickHouse/DataFusion space-filling-curve clustering, built here
from public Spark primitives only:

* the Morton spread is pure JVM bitwise arithmetic
  (``shiftleft``/``bitwiseAND``/``bitwiseOR`` — whole-stage codegen,
  no Python in the hot path);
* the global layout comes from ``repartitionByRange`` on the code
  (sampled range boundaries — Spark's own reservoir sampling, no
  driver-side quantile collection) + ``sortWithinPartitions``;
* quantization bounds come from one cheap column-stats aggregate
  (at 100 TB this is a metadata-scale scan; production systems lift
  the bounds from existing file footers instead — same two numbers).

Scale posture: one extra stats pass + exactly one exchange (the range
repartition) regardless of row count; the sort is per-partition.
Skipping is then enforced by the ORC/parquet readers' stripe/row-group
stats pruning (``spark.sql.orc.filterPushdown``), and measured here
explicitly via per-file min/max envelopes (tests/test_zorder.py):
on 16 files, a 1/4-range predicate on EITHER clustering column skips
files under z-order, while a linear sort skips none for the second
column.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..exprs import dsum, sql_dsum
from ..registry import query

#: bits per dimension for the 2-D Morton code; 16+16 → one long
MORTON_BITS = 16
_MAX_RANK = (1 << MORTON_BITS) - 1

#: (mask, shift) pairs of the classic part1by1 bit spread: 16
#: significant bits spaced out to the even bit positions of a 32-bit
#: lane (Stanford bit-twiddling hacks, "Interleave bits by Binary
#: Magic Numbers")
_SPREAD = (
    (0x00FF00FF00FF00FF, 8),
    (0x0F0F0F0F0F0F0F0F, 4),
    (0x3333333333333333, 2),
    (0x5555555555555555, 1),
)


def _part1by1(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions
    (b15..b0 → bit 30, 28, ..., 0). Pure JVM bitwise ops."""
    x = col.cast("long").bitwiseAND(F.lit(_MAX_RANK))
    for mask, shift in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton2(a: Column, b: Column) -> Column:
    """Interleave two 16-bit ranks into one Morton code: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    return _part1by1(a).bitwiseOR(F.shiftleft(_part1by1(b), 1))


def _rank16(col: Column, lo: float, hi: float) -> Column:
    """Linear min/max quantization of ``col`` to [0, 65535]. A
    constant column (hi == lo) ranks to 0 everywhere — degenerate but
    well-defined (the other dimension then fully determines order)."""
    if hi <= lo:
        return F.lit(0)
    scaled = (col.cast("double") - F.lit(float(lo))) * F.lit(
        _MAX_RANK / (hi - lo)
    )
    return F.least(
        F.greatest(F.floor(scaled), F.lit(0)), F.lit(_MAX_RANK)
    ).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 16,
    compression: str = "zstd",
    fmt: str = "orc",
) -> None:
    """Write ``df`` clustered on the 2-D Morton code of ``cols``.

    One stats aggregate (4 scalars to the driver — metadata, not
    data), one range exchange, one per-partition sort. The Morton
    column is dropped before the write; the clustering survives as
    the physical row order, which is exactly what stripe/row-group
    min/max stats capture.
    """
    ca, cb = cols
    bounds = df.agg(
        F.min(ca).cast("double").alias("alo"),
        F.max(ca).cast("double").alias("ahi"),
        F.min(cb).cast("double").alias("blo"),
        F.max(cb).cast("double").alias("bhi"),
    ).first()
    if bounds["alo"] is None or bounds["blo"] is None:
        # empty (or all-null-key) input: nothing to rank — write the
        # frame as-is through one task so the file carries the schema
        # for read-back (empty-corpus audit, r11-restart)
        writer = df.repartition(1).write.mode("overwrite").option(
            "compression", compression
        )
        getattr(writer, fmt)(path)
        return
    z = morton2(
        _rank16(F.col(ca), bounds["alo"], bounds["ahi"]),
        _rank16(F.col(cb), bounds["blo"], bounds["bhi"]),
    )
    clustered = (
        df.withColumn("__zorder", z)
        .repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
    )
    writer = clustered.write.mode("overwrite").option(
        "compression", compression
    )
    getattr(writer, fmt)(path)


def linear_write(
    df: DataFrame,
    path: str,
    col: str,
    n_files: int = 16,
    compression: str = "zstd",
    fmt: str = "orc",
) -> None:
    """Single-column range-sorted write — the comparison baseline:
    perfect skipping on ``col``, none on anything uncorrelated."""
    clustered = df.repartitionByRange(n_files, col).sortWithinPartitions(
        col
    )
    writer = clustered.write.mode("overwrite").option(
        "compression", compression
    )
    getattr(writer, fmt)(path)


def file_envelopes(
    spark: SparkSession, path: str, cols: list[str], fmt: str = "orc"
) -> DataFrame:
    """Per-file min/max envelope of ``cols`` — the exact statistics an
    ORC stripe footer / parquet row-group header / table-format
    manifest stores. Computed here by scanning (test-scale
    observability); a real reader gets them for free from footers."""
    df = getattr(spark.read, fmt)(path).withColumn(
        "file", F.input_file_name()
    )
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("file").agg(*aggs)


def skipped_fraction(
    envelopes: list[dict], col: str, lo: float, hi: float
) -> float:
    """Fraction of files whose [min,max] envelope proves they hold no
    row with ``lo <= col <= hi`` — what stats-based pruning skips."""
    miss = sum(
        1
        for e in envelopes
        if e[f"max_{col}"] < lo or e[f"min_{col}"] > hi
    )
    return miss / len(envelopes)


@query(
    "op_zorder_clustered_scan",
    oracle=f"""
        WITH b AS (
          SELECT CAST(MAX(l_orderkey) AS BIGINT) // 4 AS ok_hi,
                 CAST(MAX(l_suppkey) AS BIGINT) // 4 AS sk_hi
          FROM lineitem
        )
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               {sql_dsum("l_extendedprice", "sum_price")}
        FROM lineitem, b
        WHERE l_orderkey <= b.ok_hi AND l_suppkey <= b.sk_hi
        GROUP BY l_returnflag
    """,
    notes="Z-order clustered ORC write + rectangle-predicate read-back: "
    "lineitem is Morton-clustered on (l_orderkey, l_suppkey) into "
    "range-disjoint files, then a quarter-range predicate on BOTH "
    "columns is answered from the clustered copy and hash-checked "
    "against the UNCLUSTERED parquet oracle — proving the reorder is "
    "lossless and the pushed-down filter is exact. The skipping "
    "measurement itself (z-order skips files for predicates on either "
    "column; a linear sort only for its own) is asserted from per-file "
    "min/max envelopes in tests/test_zorder.py. At 100 TB this layout "
    "is produced by one range exchange and read via stripe-stats "
    "pruning; no all-data driver step exists.",
    tags=("io", "scale"),
)
def op_zorder_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem z-ordered by (l_orderkey, l_suppkey), then run a
    two-sided rectangle predicate against the clustered copy."""
    from .io import _scratch
    from ..scratch import path_key

    li = load(spark, sf_dir, "lineitem")
    # scratch key includes the FIXTURE path: the _SUCCESS reuse guard
    # is per written dataset, and a session that runs this op at two
    # scale factors must not serve the first fixture's clustered copy
    # to the second (same class as the dpp/fed/binscan keys — exposed
    # by the r11-restart empty-corpus regression suite, whose empty
    # fixture poisoned the sf0.01 oracle run in the same session)
    out = os.path.join(
        _scratch(f"zorder_{path_key(sf_dir)}_"),
        "lineitem_z",
    )
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        zorder_write(li, out, ("l_orderkey", "l_suppkey"))
    bounds = li.agg(
        (F.max("l_orderkey").cast("long") / 4).cast("long").alias("ok"),
        (F.max("l_suppkey").cast("long") / 4).cast("long").alias("sk"),
    ).first()
    z = spark.read.orc(out)
    return (
        z.filter(
            (F.col("l_orderkey") <= bounds["ok"])
            & (F.col("l_suppkey") <= bounds["sk"])
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            dsum(F.col("l_extendedprice"), "sum_price"),
        )
    )
