"""Projections and filters — SURVEY.md §2.B.

Reference basis: the converter only ever does ``SELECT *``
(data_to_orc_converter.sh:236); column pruning and row predicates are
the README's promise over the ORC output ("only read necessary data",
README.md:18; ``WHERE age > 25`` Presto example, README.md:218).

Scale posture: all of these are pure Catalyst — the projection and the
predicates push down into the columnar scan (``ReadSchema`` /
``PushedFilters`` in the physical plan), so at 100 TB the scan reads
only the referenced columns and skips row groups via min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..exprs import dsum, sql_dsum
from ..registry import query


@query(
    "op_project",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
    tags=("projection",),
)
def op_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: a 3-column projection of part. The physical plan
    must show ReadSchema with exactly these columns."""
    return load(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")


@query(
    "op_select_star",
    oracle="SELECT * FROM nation",
    tags=("projection",),
)
def op_select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full projection — the only projection the reference itself performs
    (SELECT * at data_to_orc_converter.sh:236)."""
    return load(spark, sf_dir, "nation").select("*")


@query(
    "op_filter",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > 5000.0
    """,
    tags=("filter",),
)
def op_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple comparison predicate (the README's WHERE age > 25 shape).
    Pushes down to the parquet/ORC scan as a gt filter."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "op_filter_compound",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE ((o_orderstatus = 'O' AND o_totalprice BETWEEN 10000.0 AND 100000.0)
               OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
          AND NOT (o_orderstatus = 'P')
          AND o_totalprice IS NOT NULL
    """,
    tags=("filter",),
)
def op_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT / IN / BETWEEN / IS NULL predicate surface."""
    o = load(spark, sf_dir, "orders")
    pred = (
        (
            ((F.col("o_orderstatus") == "O") & F.col("o_totalprice").between(10000.0, 100000.0))
            | F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        & ~(F.col("o_orderstatus") == "P")
        & F.col("o_totalprice").isNotNull()
    )
    return o.filter(pred).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


@query(
    "op_filter_date",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    """,
    tags=("filter",),
)
def op_filter_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-range predicate — the shape partition pruning keys on
    when the table is date-partitioned at scale."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


@query(
    "op_unpivot",
    oracle=f"""
        SELECT metric, COUNT(*) AS n,
               {sql_dsum("val", "total")}
        FROM (
          SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', l_extendedprice FROM lineitem
          UNION ALL
          SELECT 'l_discount', l_discount FROM lineitem
          UNION ALL
          SELECT 'l_tax', l_tax FROM lineitem
        )
        GROUP BY metric
    """,
    notes="Wide->long unpivot (melt) of lineitem's four measures, "
    "aggregated per metric. Spark's native unpivot is a zero-shuffle "
    "projection (each input row emits 4 rows in the scan stage); only "
    "the 4-group aggregate exchanges. The UNION ALL oracle is the "
    "ANSI-SQL equivalent.",
    tags=("relational",),
)
def op_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt lineitem measures to (metric, value) and summarize."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.groupBy("metric").agg(
        F.count("*").alias("n"),
        dsum(F.col("val"), "total"),
    )


#: One SQL text, two engines: op_sql_passthrough runs this EXACT string
#: on Spark (over registered temp views) and on DuckDB (as the oracle).
#: Staying inside the shared ANSI dialect — explicit casts, the
#: fixed-point sum convention, total-order LIMIT — makes the engines
#: bit-identical, which is the strongest possible parity statement for
#: the reference's 'query the ORC output from any SQL engine' story
#: (reference README.md:194-218).
SQL_RETURNED_ITEMS = """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount))
                               * 1000000 + 0.5) AS DECIMAL(18,0)))
                AS DOUBLE) / 1000000.0 AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@query(
    "op_sql_passthrough",
    oracle=SQL_RETURNED_ITEMS,
    notes="TPC-H Q10 shape (returned-item report) written ONCE as ANSI "
    "SQL and executed verbatim by both engines: Spark runs the string "
    "via spark.sql over registered views, DuckDB runs the identical "
    "string as the oracle. Demonstrates the engine's SQL surface is a "
    "first-class entry point, not just the DataFrame API.",
    tags=("relational", "join", "sql"),
)
def op_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the shared SQL text through Spark's SQL entry point."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_RETURNED_ITEMS)


@query(
    "op_surrogate_key",
    oracle="""
        SELECT o_orderkey,
               CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT)
                 AS seq_id
        FROM orders
    """,
    notes="Global dense sequence assignment WITHOUT the naive plan's "
    "single-partition global sort (ROW_NUMBER over an empty "
    "PARTITION BY collapses all data onto one task — the classic "
    "100 TB killer). Instead: DETERMINISTIC range buckets from "
    "quantile cutpoints of the key (15 driver scalars — metadata; "
    "repartitionByRange's sampled boundaries would differ between "
    "the count pass and the assignment pass, which is exactly the "
    "bug this formulation avoids), per-bucket COUNTS to the driver, "
    "a prefix-sum of offsets folded back as a CASE column, and "
    "ROW_NUMBER within each bucket plus its offset — the only "
    "exchange over data is the per-bucket window. Bit-identical to "
    "the oracle's global ROW_NUMBER because the key is unique and "
    "buckets are totally ordered. This is how production engines "
    "implement zipWithIndex/IDENTITY backfills at scale.",
    tags=("relational", "scale"),
)
def op_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1-based sequence ids over orders, ordered by o_orderkey."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select("o_orderkey")
    fracs = [i / 16 for i in range(1, 16)]
    # Cutpoints come from a seeded 1% SAMPLE: exact percentile would
    # materialize every key in one aggregation buffer (measured 7.6 s
    # of the op's 6 s total at sf1 — the single-reducer trap), while
    # boundaries only need to be *balanced*, not exact. They are
    # collected ONCE and frozen as literals, so the count pass and
    # the assignment pass see identical buckets — determinism does
    # not depend on the sample re-evaluating identically.
    sample = o.sample(fraction=0.01, seed=42)
    if sample.isEmpty():
        sample = o
    cuts = sample.agg(
        F.expr(
            f"percentile(o_orderkey, array({','.join(map(str, fracs))}))"
        ).alias("c")
    ).first()["c"]
    if cuts is None:
        # percentile over an empty key column is NULL: no cutpoints,
        # every (zero) row lands in bucket 0 (empty-corpus audit,
        # r11-restart)
        cuts = []
    pid = sum(
        ((F.col("o_orderkey") > F.lit(float(c))).cast("int") for c in cuts),
        F.lit(0),  # Column start value so zero cutpoints still build
    ).alias("pid")
    with_pid = o.select("o_orderkey", pid)
    # one row per bucket → driver; prefix-sum is metadata-scale
    counts = {
        r["pid"]: r["cnt"]
        for r in with_pid.groupBy("pid")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_col = (
        F.coalesce(
            *[
                F.when(F.col("pid") == b, F.lit(off))
                for b, off in offsets.items()
            ]
        )
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("pid").orderBy("o_orderkey")
    return with_pid.select(
        "o_orderkey",
        (F.row_number().over(w) + offset_col.cast("bigint")).alias(
            "seq_id"
        ),
    )
