"""Set operations — SURVEY.md §2.G (DOC: standard surface over the
reference's relational output)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "op_union_all",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        UNION ALL
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000.0
    """,
    tags=("setop",),
)
def op_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (keeps duplicates) — a zero-shuffle concatenation of
    partitions; the overlap between the two filters is intentional."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_mktsegment"
    )
    b = c.filter(F.col("c_acctbal") > 9000.0).select("c_custkey", "c_mktsegment")
    return a.unionByName(b)


@query(
    "op_union_distinct",
    oracle="""
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        UNION
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000.0
    """,
    tags=("setop",),
)
def op_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: union-all followed by a hash-aggregate distinct
    (one shuffle on all columns)."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_mktsegment"
    )
    b = c.filter(F.col("c_acctbal") > 9000.0).select("c_custkey", "c_mktsegment")
    return a.unionByName(b).distinct()


@query(
    "op_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def op_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding both open and finished orders — plans as a
    left-semi join over distinct inputs."""
    o = load(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(finished)


@query(
    "op_except",
    oracle="""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_totalprice > 400000
    """,
    notes="Set difference, planned as a left-anti join over distinct "
    "inputs. The price predicate on the subtracted side keeps the "
    "result NON-EMPTY at every fixture scale (every customer has "
    "some order, so the unfiltered difference verified 0 = 0 rows — "
    "vacuous; same fix as op_join_anti, different threshold).",
    tags=("setop",),
)
def op_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers minus those with any 400k+ order."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.exceptAll(o.distinct()).distinct()


@query(
    "op_union_mixed_schema",
    oracle="""
        SELECT c_custkey AS entity_key, c_name AS entity_name,
               c_acctbal AS acctbal, NULL AS totalprice
        FROM customer WHERE c_acctbal > 9500.0
        UNION ALL
        SELECT o_orderkey AS entity_key, NULL AS entity_name,
               NULL AS acctbal, o_totalprice AS totalprice
        FROM orders WHERE o_totalprice > 520000.0
    """,
    notes="Schema-evolution union: unionByName(allowMissingColumns) "
    "null-fills the columns each side lacks — the DataFrame analogue "
    "of reading mixed-schema part files.",
    tags=("setop",),
)
def op_union_mixed_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of differently-shaped entity tables by column name."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500.0)
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("entity_name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 520000.0)
        .select(
            F.col("o_orderkey").alias("entity_key"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )
    return c.unionByName(o, allowMissingColumns=True)
