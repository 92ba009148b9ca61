"""I/O operators surfaced as oracle-checked queries — SURVEY.md §2.A.

The conversion surface (sources/, sinks/) is round-trip-tested in
tests/test_conversion.py; the queries here additionally run the ORC
write→read path inside the driver's correctness gate, so format
fidelity is hash-checked against the parquet originals every round.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..exprs import dsum, sql_dsum
from ..registry import query
from ..sinks.orc import read_orc, write_orc


@query(
    "op_orc_roundtrip",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               {sql_dsum("o_totalprice", "total_price")}
        FROM orders
        GROUP BY o_orderstatus
    """,
    notes="snk_orc_write + src_orc_scan in the correctness gate: "
    "parquet → ORC (snappy, 50k-row chunks) → read back → aggregate; "
    "hash-matching the oracle on the ORIGINAL parquet proves the ORC "
    "round-trip is lossless for every type in the table.",
    tags=("io",),
)
def op_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole raison d'être (source → ORC → query) as a
    single checked query."""
    o = load(spark, sf_dir, "orders")
    out = os.path.join(tempfile.mkdtemp(prefix="orc_rt_"), "orders")
    write_orc(o, out, compression="snappy")
    back = read_orc(spark, out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_price"),
    )


@query(
    "op_orc_partitioned_scan",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY c_mktsegment
    """,
    notes="Hive-partitioned ORC write + partition-pruned read-back: "
    "the filter prunes to 2 of 5 partition directories before any "
    "file is opened — the layout upgrade that matters most at 100 TB.",
    tags=("io",),
)
def op_orc_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snk_partitioned_write + partition pruning, hash-checked."""
    c = load(spark, sf_dir, "customer")
    out = os.path.join(tempfile.mkdtemp(prefix="orc_part_"), "customer")
    write_orc(c, out, partition_by=["c_mktsegment"])
    back = read_orc(spark, out).filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    return back.groupBy("c_mktsegment").agg(F.count("*").alias("n_customers"))
