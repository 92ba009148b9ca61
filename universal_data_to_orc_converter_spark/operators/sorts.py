"""Sorts / limits / top-k — SURVEY.md §2.F.

The reference's LIMIT/OFFSET chunk loop (data_to_orc_converter.sh:236)
is the REF basis; ORDER BY queries are the README's analytics promise.
Every limited query here orders by a total order (unique-key
tiebreakers) so both engines select identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "op_sort",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    tags=("sort",),
)
def op_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort: Spark range-partitions on a sampled key
    distribution, so the sort scales out instead of funnelling through
    one node."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@query(
    "op_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    tags=("sort",),
)
def op_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT compiles to TakeOrderedAndProject: each task
    keeps a k-row heap, the driver merges k·tasks rows — no global
    sort, no full shuffle. The 100 TB-safe top-k."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "op_limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_orderkey
        LIMIT 100 OFFSET 50
    """,
    notes="Deterministic only because the sort is total (unique key) — "
    "the reference's unordered LIMIT/OFFSET pagination (sh:236) is "
    "nondeterministic and O(n²) server-side; this is the corrected "
    "semantics.",
    tags=("sort",),
)
def op_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-stable pagination page: ORDER BY unique key, then
    offset+limit."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(50)
        .limit(100)
    )
