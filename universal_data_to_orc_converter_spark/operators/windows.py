"""Window functions — SURVEY.md §2.E (DOC: the README's BI/dashboard
workloads, reference README.md:223-225).

Scale note: a window partitioned by a key is one shuffle on that key;
frames are evaluated streaming within each partition. Running sums use
the decimal-cast convention so the prefix sums are order-of-evaluation
independent and match the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "op_win_rank",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def op_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per nation; c_custkey tiebreak
    makes row_number deterministic."""
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "op_win_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def op_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next order price per customer in order-date order."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "op_win_frame",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS running_spend,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS moving_spend_3
        FROM orders
    """,
    tags=("window",),
)
def op_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running and sliding (3-row) frame sums per customer. Decimal
    accumulator ⇒ exact prefix sums on both engines."""
    o = load(spark, sf_dir, "orders")
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = base.rowsBetween(-2, W.currentRow)
    price_dec = F.col("o_totalprice").cast("decimal(18,6)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec).over(run).cast("double").alias("running_spend"),
        F.sum(price_dec).over(mov).cast("double").alias("moving_spend_3"),
    )


@query(
    "op_win_topk_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    tags=("window",),
)
def op_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the grouped top-k idiom. Spark ≥3.5
    pushes a per-partition rank limit below the shuffle
    (WindowGroupLimit), so each task emits ≤k rows per key before the
    exchange — the reason this survives skewed keys at 100 TB."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "op_win_range_frame",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               CAST(COUNT(*) OVER (ORDER BY o_totalprice
                                   RANGE BETWEEN 10000.0 PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
                   AS n_similar_cheaper
        FROM orders
    """,
    notes="RANGE frame over values (not rows): the frame holds every "
    "order within 10k below the current price — count is integer-"
    "exact.",
    tags=("window",),
)
def op_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE window frame (peers by value distance, where
    ROWS frames count physical neighbors).

    Scale note: this op PINS the global RANGE-frame semantics, and a
    global frame is inherently Exchange SinglePartition in Spark —
    fine for a semantics gate, wrong as a 100 TB building block. The
    scale formulation of 'count of rows within 10k below' is a range
    self-join on value buckets (op_join_range_bucketized's shape) or
    a two-pass bucket count + boundary correction; a real pipeline
    should reach for those, and this docstring is the signpost."""
    o = load(spark, sf_dir, "orders")
    w = (
        W.orderBy("o_totalprice").rangeBetween(-10000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).cast("bigint").alias("n_similar_cheaper"),
    )


@query(
    "op_win_rank_family",
    oracle="""
        SELECT s_suppkey,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               CAST(ntile(4) OVER w AS INT) AS quartile
        FROM supplier
        WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    """,
    notes="percent_rank / cume_dist / ntile — the remaining rank "
    "family; (rank-1)/(n-1) and rank/n divisions are identical "
    "integer-ratio doubles on both engines.",
    tags=("window",),
)
def op_win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank functions over a total order.

    Scale note: pins the global percent_rank/cume_dist/ntile
    semantics, which Spark executes single-partition (empty PARTITION
    BY). At scale each is derivable from a bucket-offset rank
    (op_surrogate_key / op_vocab_encode technique) divided by the
    global count: (rank-1)/(n-1), rank/n, 1+((rank-1)*k)/n — exact,
    no single task. Kept as the literal window here because THAT is
    the surface this gate verifies."""
    w = W.orderBy("s_acctbal", "s_suppkey")
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@query(
    "op_win_first_last",
    oracle="""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey)
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING) AS last_order,
               nth_value(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    notes="first_value / last_value / nth_value with explicit full "
    "frame for last_value (the default frame ends at CURRENT ROW — "
    "the classic silent-wrong-answer both engines share).",
    tags=("window",),
)
def op_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window values per customer order history."""
    o = load(spark, sf_dir, "orders")
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(base).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(base).alias("second_order"),
    )


@query(
    "op_win_rolling_median",
    oracle="""
        WITH b AS (
          SELECT user_id, event_id, ts,
                 CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vfp
          FROM events
        ),
        w AS (
          SELECT user_id, event_id,
                 list_sort(list(vfp) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
          FROM b
        )
        SELECT user_id, event_id,
               CAST(len(arr) AS INT) AS n_window,
               CAST(CASE WHEN len(arr) % 2 = 1
                         THEN 2 * arr[(len(arr) + 1) // 2]
                         ELSE arr[len(arr) // 2] + arr[len(arr) // 2 + 1]
                    END AS BIGINT) AS median2_fp
        FROM w
    """,
    notes="EXACT rolling median over a trailing 7-row window — the "
    "order statistic Spark has no built-in window function for "
    "(percentile_approx is a sketch; percentile as a window re-sorts "
    "per frame JVM-side but only for untyped frames). Implemented as "
    "collect_list over the frame -> array_sort -> middle-element "
    "arithmetic, all JVM expressions inside the one window exchange. "
    "Cross-engine float safety: the median interpolation for "
    "even-sized frames is lo+(hi-lo)/2 in one engine and (lo+hi)/2 in "
    "another — last-ulp divergent — so the op emits 2x the median in "
    "exact FIXED-POINT integers (odd frame: 2*mid; even: lo+hi), "
    "bit-identical by construction; a consumer divides by 2e6 for the "
    "float value. Scale: one shuffle (the user_id window); the frame "
    "buffer is bounded at 7 values per row regardless of data volume, "
    "so memory is O(frame), not O(partition) — this is why the "
    "collect_list-over-frame trick is safe where "
    "collect_list-over-partition would not be.",
    tags=("window", "scale"),
)
def op_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-row median of event value per user, in 2x
    fixed-point integers (see notes for why)."""
    from ..exprs import _scaled

    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, W.currentRow)
    )
    arr = F.array_sort(F.collect_list(_scaled(F.col("value")).cast("bigint")).over(w))
    base = e.select("user_id", "event_id", arr.alias("arr"))
    n = F.size("arr")
    median2 = F.when(
        n % 2 == 1, 2 * F.element_at("arr", ((n + 1) / 2).cast("int"))
    ).otherwise(
        F.element_at("arr", (n / 2).cast("int"))
        + F.element_at("arr", (n / 2 + 1).cast("int"))
    )
    return base.select(
        "user_id",
        "event_id",
        n.cast("int").alias("n_window"),
        median2.cast("bigint").alias("median2_fp"),
    )
