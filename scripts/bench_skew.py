"""Measure the window→join skew hardenings against REAL skew.

Round 6 rewrote three text ops' count-attachment from windows to
map-side-combined groupBy+join because a window partitioned on a
corpus-hot gram key pins every one of that gram's instance rows onto
one task with no partial aggregation. On the UNIFORM fixtures the
window formulation is ~1.5× faster locally, and the hardening's value
rested on reasoning alone (r6 verdict #4). This script runs BOTH
formulations of op_doc_duplication_coverage and op_lm_doc_score on
the skewed fixture (scripts/make_skewed.py: ONE hot trigram key
carrying ~6.2M of ~11M instance rows — a measured 299× max/median
partition imbalance at 256 partitions) and on /tmp/sf1 (uniform, same
order of magnitude) and prints min-of-N wall times — the numbers
PERF.md's "skewed fixture experiment" records.

The window replicas below are faithful to the r5-era formulations
they replaced (same logical result; the oracle parity of the join
path is already driver-checked).

Usage: PYTHONPATH=/root/repo python scripts/bench_skew.py [n_runs]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.operators.text import (
    op_doc_duplication_coverage,
    op_lm_doc_score,
)
from universal_data_to_orc_converter_spark.session import get_spark

SKEW_DIR = "/tmp/sfskew"
UNIFORM_DIR = "/tmp/sf1"
N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def coverage_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REJECTED window formulation of op_doc_duplication_coverage:
    sharedness via count() OVER (PARTITION BY gh) — every instance of
    a hot gram lands in one window task."""
    d = load(spark, sf_dir, "documents")
    t = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 7),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(8))),
        )
    )
    dg = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 8)
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("gh"))
    )
    nd = F.count("*").over(Window.partitionBy("gh"))
    return (
        dg.withColumn("is_shared", nd >= 2)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.count(F.when(F.col("is_shared"), 1))
            .cast("bigint")
            .alias("n_shared"),
        )
        .withColumn(
            "shared_frac",
            F.col("n_shared").cast("double") / F.col("n_grams"),
        )
        .orderBy(F.desc("shared_frac"), "doc_id")
        .limit(50)
    )


def lm_score_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REJECTED window formulation of op_lm_doc_score: trigram and
    context counts attached via count() OVER (PARTITION BY th/ch)."""
    d = load(spark, sf_dir, "documents")
    t = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    tri = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + 1).alias("w2"),
                        F.element_at(F.col("t"), i + 2).alias("w3"),
                    ),
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.xxhash64("g.w1", "g.w2", "g.w3").alias("th"),
            F.xxhash64("g.w1", "g.w2").alias("ch"),
        )
    )
    tri_c = F.count("*").over(Window.partitionBy("th"))
    ctx_c = F.count("*").over(Window.partitionBy("ch"))
    m = tri.withColumn("tri_c", tri_c).withColumn("ctx_c", ctx_c)
    return (
        m.select(
            "doc_id", F.expr("tri_c * 1000000 DIV ctx_c").alias("p_fp")
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tri"),
            F.sum("p_fp").cast("bigint").alias("sum_p_fp"),
        )
        .withColumn(
            "avg_p_fp", F.col("sum_p_fp").cast("double") / F.col("n_tri")
        )
        .orderBy(F.asc("avg_p_fp"), "doc_id")
        .limit(50)
    )


def timed(fn, *args) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        df = fn(*args)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen once
    load(spark, UNIFORM_DIR, "documents").count()

    pairs = [
        ("coverage", op_doc_duplication_coverage, coverage_window),
        ("lm_score", op_lm_doc_score, lm_score_window),
    ]
    # the third section models CLUSTER task granularity: a window
    # straggles once hot_key_rows > total_rows / n_tasks — coverage's
    # per-key cap is n_docs (array_distinct), so at 32 partitions the
    # hot task never exceeds the average (n_tasks < grams_per_doc /
    # boilerplate_share ~ 66) and only a higher partition count (any
    # real cluster) exposes the hazard the hardening removes.
    for title, sf_dir, parts, only in (
        ("uniform sf1", UNIFORM_DIR, None, None),
        ("SKEWED", SKEW_DIR, None, None),
        ("SKEWED @ 256 shuffle partitions", SKEW_DIR, 256, None),
        # short-doc corpus: the tail shrinks ~5x so the hot gram
        # finally exceeds the per-task budget even for coverage's
        # n_docs-capped key — the window plan's straggler becomes
        # measurable locally instead of extrapolated
        ("SHORT-DOC SKEWED @ 256 parts", SKEW_DIR + "_short", 256,
         "coverage"),
    ):
        saved = spark.conf.get("spark.sql.shuffle.partitions")
        if parts:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            print(f"--- {title} ({sf_dir}) ---")
            for name, join_fn, win_fn in pairs:
                if only and name != only:
                    continue
                tj = timed(join_fn, spark, sf_dir)
                tw = timed(win_fn, spark, sf_dir)
                print(
                    f"{name}: join={tj:.2f}s window={tw:.2f}s "
                    f"(window/join = {tw / tj:.2f}x)",
                    flush=True,
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)


if __name__ == "__main__":
    main()
