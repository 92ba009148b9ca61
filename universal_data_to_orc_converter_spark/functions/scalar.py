"""Scalar functions — SURVEY.md §2.H (string / regex / date / math /
cast / null handling).

Reference basis: the converter's cell cleanup is quote-strip + trim
(data_to_orc_converter.sh:360-363) and its dump parser is regex-driven
(sh:329-357); the typed-column surface follows the documented type
mapping (reference README.md:253-259).

All of these are built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Cross-engine traps
handled explicitly:

* DuckDB ``year()``/``length()``/``floor()`` return BIGINT/DOUBLE where
  Spark returns INT/LONG — both sides cast to a common type.
* double→int casts TRUNCATE in Spark but ROUND in DuckDB — never cast a
  fractional double to int directly; go through ``floor``/``round``.
* ``round(x, d)`` on a binary double is engine-ambiguous at decimal
  half-way points — only integer-rounding (d=0) is used, where halves
  are exactly representable and both engines round away from zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "op_str_funcs",
    oracle="""
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               LOWER(c_mktsegment) AS seg_lower,
               CAST(LENGTH(c_name) AS BIGINT) AS name_len,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               CONCAT_WS('-', c_mktsegment, c_name) AS seg_name,
               TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed
        FROM customer
    """,
    tags=("scalar",),
)
def op_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substring/concat_ws/trim — the reference's
    cell-cleanup surface (sh:360-363) as engine expressions."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
    )


@query(
    "op_regexp",
    oracle="""
        SELECT c_custkey,
               regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
               regexp_replace(c_name, '[0-9]+', '#') AS name_masked,
               CASE WHEN regexp_matches(c_name, '00[0-9]*[02468]$')
                    THEN TRUE ELSE FALSE END AS is_even_id
        FROM customer
    """,
    tags=("scalar",),
)
def op_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike — the reference's dump
    parser is regex-driven (sh:329-357); here regexes run codegen'd in
    the JVM instead of row-at-a-time Python."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.col("c_name").rlike("00[0-9]*[02468]$").alias("is_even_id"),
    )


@query(
    "op_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(day(o_orderdate) AS INT) AS order_day,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
        FROM orders
    """,
    tags=("scalar",),
)
def op_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/to_date/unix_timestamp over the
    documented DATE→DATE / DATETIME→TIMESTAMP mapping (README:258-259).
    Session timezone is pinned UTC so epoch values match the
    zone-naive oracle."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.to_date("o_orderdate").alias("order_date"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("order_epoch"),
    )


@query(
    "op_datediff",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)) AS INT)
                   AS ship_delay_days
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("scalar",),
)
def op_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between order and ship date (midnight-aligned fixtures, so
    calendar-day diff equals elapsed-day diff in both engines)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("ship_delay_days"),
    )


@query(
    "op_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice) AS DOUBLE) AS price_rounded,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(l_quantity AS BIGINT) % 7 AS qty_mod
        FROM lineitem
    """,
    tags=("scalar",),
)
def op_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/modulo. Only integer rounding (see module
    docstring); abs over a double difference is exact per-row."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice").cast("double").alias("price_rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


@query(
    "op_cast",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS INT) AS qty_int,
               CAST(l_linenumber AS VARCHAR) AS line_str,
               CAST(CAST(l_quantity AS INT) AS DOUBLE) AS qty_roundtrip,
               CAST(regexp_extract(CAST(l_orderkey AS VARCHAR), '([0-9]+)', 1)
                    AS BIGINT) AS key_from_str
        FROM lineitem
    """,
    tags=("scalar",),
)
def op_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-coercion surface (the typed replacement for the reference's
    all-strings dump output, sh:382). l_quantity is integral-valued, so
    the double→int cast is unambiguous across engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_quantity").cast("int").cast("double").alias("qty_roundtrip"),
        F.regexp_extract(F.col("l_orderkey").cast("string"), "([0-9]+)", 1)
        .cast("bigint")
        .alias("key_from_str"),
    )


@query(
    "op_null_handling",
    oracle="""
        SELECT c.c_custkey,
               COALESCE(o.o_totalprice, 0.0) AS price_or_zero,
               CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END AS is_missing,
               COALESCE(o.o_orderpriority, 'NONE') AS priority_filled
        FROM customer c
        LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000.0) o
          ON c.c_custkey = o.o_custkey
    """,
    tags=("scalar",),
)
def op_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / null tests over outer-join-introduced nulls (the
    fixtures themselves are null-free, mirroring the reference's
    pandas-NaN-only null story, sh:468-471)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("price_or_zero"),
        F.when(F.col("o_orderkey").isNull(), 1).otherwise(0).alias("is_missing"),
        F.coalesce(F.col("o_orderpriority"), F.lit("NONE")).alias("priority_filled"),
    )


@query(
    "op_str_funcs2",
    oracle="""
        SELECT p_partkey,
               split_part(p_name, ' ', 1) AS first_word,
               split_part(p_name, ' ', 2) AS second_word,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
               rpad(p_brand, 12, '.') AS brand_padded,
               replace(p_type, 'E', '3') AS type_leet,
               reverse(p_name) AS name_reversed,
               left(p_name, 3) AS name_left,
               right(p_name, 3) AS name_right
        FROM part
    """,
    tags=("scalar",),
)
def op_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface: split_part / lpad / rpad / replace /
    reverse / left / right (all 1-based, engine-aligned)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.replace(F.col("p_type"), F.lit("E"), F.lit("3")).alias("type_leet"),
        F.reverse("p_name").alias("name_reversed"),
        F.substring("p_name", 1, 3).alias("name_left"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("name_right"),
    )


@query(
    "op_cond_funcs",
    oracle="""
        SELECT s_suppkey,
               greatest(s_acctbal, 0.0) AS bal_floor0,
               least(s_acctbal, 5000.0) AS bal_cap5k,
               nullif(s_nationkey, 0) AS nation_or_null,
               CASE WHEN s_acctbal > 5000.0 THEN 'rich'
                    WHEN s_acctbal > 0.0 THEN 'ok'
                    ELSE 'neg' END AS tier
        FROM supplier
    """,
    tags=("scalar",),
)
def op_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar surface: greatest / least / nullif / CASE."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.greatest("s_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("s_acctbal", F.lit(5000.0)).alias("bal_cap5k"),
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("nation_or_null"),
        F.when(F.col("s_acctbal") > 5000.0, "rich")
        .when(F.col("s_acctbal") > 0.0, "ok")
        .otherwise("neg")
        .alias("tier"),
    )


@query(
    "op_date_funcs2",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS review_date,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(dayofweek(o_orderdate) AS INT) AS dow0,
               CAST(quarter(o_orderdate) AS INT) AS q
        FROM orders
    """,
    notes="dayofweek is normalized to DuckDB's 0=Sunday convention "
    "(Spark's is 1=Sunday).",
    tags=("scalar",),
)
def op_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date surface: date_add / add_months / last_day /
    day-of-week / quarter."""
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).alias("due_date"),
        F.add_months(d, 3).alias("review_date"),
        F.last_day(d).alias("month_end"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow0"),
        F.quarter("o_orderdate").cast("int").alias("q"),
    )
