"""Subquery-shaped queries — scalar and correlated decorrelation.

The reference's query surface (README:194-218) is flat SELECTs over
converted ORC, but any SQL engine a reference user migrates toward
(Presto in its own examples) runs subqueries; these two are the
canonical decorrelation shapes, written the way Catalyst wants them:
a scalar subquery becomes a broadcast of a 1-row aggregate, a
correlated aggregate subquery becomes a group-agg joined back on the
correlation key. Semi/anti (IN / EXISTS) shapes live in
operators/joins.py.

Exactness: every average is the exact fixed-point sum divided by the
count (see exprs.py) so the filter threshold is bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..plans.hints import hint_broadcast
from ..exprs import dsum, sql_dsum
from ..registry import query

#: exact average as a SQL fragment (no alias — used inline)
_SQL_AVG_TOTALPRICE = (
    "CAST(SUM(CAST(FLOOR(o_totalprice * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
    " / 1000000.0 / COUNT(o_totalprice)"
)
_SQL_AVG_QTY = (
    "CAST(SUM(CAST(FLOOR(l_quantity * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
    " / 1000000.0 / COUNT(l_quantity)"
)


@query(
    "op_subquery_scalar",
    oracle=f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_above,
               {sql_dsum("o_totalprice", "revenue_above")}
        FROM orders
        WHERE o_totalprice > (SELECT {_SQL_AVG_TOTALPRICE} FROM orders)
        GROUP BY o_orderstatus
    """,
    notes="Scalar subquery (orders above the global average price), "
    "decorrelated to a 1-row aggregate broadcast-joined into the "
    "filter — the plan Catalyst produces for an uncorrelated scalar "
    "subquery. The average goes through the exact fixed-point sum so "
    "the threshold is bit-identical across engines.",
    tags=("subquery", "filter", "agg"),
)
def op_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE x > (SELECT AVG(x) FROM t) as a broadcast of one row.

    Scale posture: the subquery side is a full-table aggregate that
    reduces to ONE row (map-side partials, single final row) and then
    broadcasts; the outer side is a scan+filter with no shuffle."""
    o = load(spark, sf_dir, "orders")
    threshold = o.agg(
        (
            F.sum(F.floor(F.col("o_totalprice") * 1_000_000 + F.lit(0.5)).cast("decimal(18,0)"))
            .cast("double")
            / 1_000_000.0
            / F.count("o_totalprice")
        ).alias("avg_price")
    )
    return (
        o.join(F.broadcast(threshold))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_above"),
            dsum(F.col("o_totalprice"), "revenue_above"),
        )
    )


@query(
    "op_subquery_correlated",
    oracle=f"""
        WITH per_part AS (
          SELECT l_partkey, {_SQL_AVG_QTY} AS avg_qty
          FROM lineitem
          GROUP BY l_partkey
        )
        SELECT p.p_brand,
               COUNT(*) AS n_small,
               {sql_dsum("l.l_extendedprice", "small_revenue")}
        FROM lineitem l
        JOIN per_part a ON l.l_partkey = a.l_partkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity < 0.2 * a.avg_qty
        GROUP BY p.p_brand
    """,
    notes="Correlated aggregate subquery (TPC-H Q17 shape: lineitems "
    "below 20% of their part's average quantity), decorrelated to a "
    "per-key aggregate joined back on the correlation key — the "
    "standard rewrite every optimizer applies. Exact fixed-point "
    "averages keep the 0.2*avg threshold bit-identical.",
    tags=("subquery", "join", "agg"),
)
def op_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE qty < 0.2 * (SELECT AVG(qty) ... WHERE same part) via
    group-agg + self-join.

    Scale posture: the per-part aggregate is ~|part| rows (partial
    aggregation map-side); the join back to lineitem shuffles both
    sides on l_partkey ONCE and AQE flips it to broadcast when the
    aggregate side fits. part joins un-hinted: stats broadcast it at
    fixture scale; at 100 TB it is sort-merge with AQE re-upgrade."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    per_part = li.groupBy("l_partkey").agg(
        (
            F.sum(F.floor(F.col("l_quantity") * 1_000_000 + F.lit(0.5)).cast("decimal(18,0)"))
            .cast("double")
            / 1_000_000.0
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .join(hint_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            dsum(F.col("l_extendedprice"), "small_revenue"),
        )
    )


@query(
    "op_recursive_cte",
    oracle="""
        WITH RECURSIVE h AS (
          SELECT n_nationkey AS k, n_name AS name,
                 CAST(0 AS BIGINT) AS depth,
                 CAST(n_name AS VARCHAR) AS path
          FROM nation WHERE n_nationkey = 0
          UNION ALL
          SELECT n.n_nationkey, n.n_name, h.depth + 1,
                 h.path || '>' || n.n_name
          FROM nation n
          JOIN h ON (n.n_nationkey - 1) // 2 = h.k
          WHERE n.n_nationkey > 0
        )
        SELECT k, name, depth, path FROM h
    """,
    notes="RECURSIVE CTE — new SQL surface in Spark 4 (WITH "
    "RECURSIVE; UnionLoop execution): transitive closure over a "
    "hierarchy, the query class plain SQL could not express before. "
    "The hierarchy is derived deterministically from nation "
    "(parent(k) = (k-1) div 2, a binary tree over the 25 keys); the "
    "recursion computes every node's depth and root path, and both "
    "engines run the SAME recursive SQL text natively — integer "
    "division is the truncating div both agree on for non-negative "
    "keys. Scale posture: each iteration joins the FRONTIER (rows "
    "added last round) to the edge table, so depth bounds the "
    "iteration count (log n here); for corpus-scale graphs with "
    "unbounded depth the engine's iterative-DataFrame ops "
    "(op_pagerank, op_dedup_clusters) with their checkpointed-"
    "lineage loops remain the right tool — this op pins the SQL-"
    "surface parity for moderate-depth hierarchies (org charts, "
    "BOM explosions, folder trees).",
    tags=("subquery", "composite"),
)
def op_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy closure (depth + root path) via Spark 4's WITH
    RECURSIVE over a derived nation tree."""
    load(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_rcte_v"
    )
    return spark.sql("""
        WITH RECURSIVE h AS (
          SELECT n_nationkey AS k, n_name AS name,
                 CAST(0 AS BIGINT) AS depth,
                 CAST(n_name AS STRING) AS path
          FROM nation_rcte_v WHERE n_nationkey = 0
          UNION ALL
          SELECT n.n_nationkey, n.n_name, h.depth + 1,
                 h.path || '>' || n.n_name
          FROM nation_rcte_v n
          JOIN h ON (n.n_nationkey - 1) DIV 2 = h.k
          WHERE n.n_nationkey > 0
        )
        SELECT k, name, depth, path FROM h
    """)


@query(
    "op_sql_pipe_syntax",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                 AS total_qty,
               {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    notes="SQL PIPE syntax — the second new Spark 4 SQL surface "
    "(|> operators, alongside WITH RECURSIVE): the Q1-shape "
    "filter->aggregate->order expressed as a linear pipeline "
    "(FROM |> WHERE |> AGGREGATE ... GROUP BY |> ORDER BY), parsed "
    "by Spark's own pipe-operator grammar into the IDENTICAL logical "
    "plan as the classic form — so the oracle is the classic-SQL "
    "text (DuckDB has no pipe grammar) and the hash-match proves the "
    "two surfaces are semantically one. Sums ride the engine's "
    "exact-fixed-point convention inside the pipe stage; Catalyst "
    "treats both forms identically, so every pushdown/partial-agg "
    "property the plan tests pin for Q1 holds here too.",
    tags=("subquery", "composite"),
)
def op_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-shape rollup written in Spark 4's |> pipe-operator SQL."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe_v"
    )
    return spark.sql("""
        FROM lineitem_pipe_v
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS total_qty,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                 * 1000000 + 0.5) AS DECIMAL(28, 0)))
                  AS DOUBLE) / 1000000.0 AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
    """)
