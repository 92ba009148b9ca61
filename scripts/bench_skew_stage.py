"""Isolate the SHAREDNESS-ATTACHMENT stage of
op_doc_duplication_coverage (verdict r7 #3 / TODO_r8 stretch a).

Whole-op walls on the skewed fixture never flipped in the join plan's
favor locally because ~85% of the wall is gram ENUMERATION (narrow
map work both formulations share) — the stage the r6 hardening
actually changed was invisible inside it. This script removes the
shared work from the measurement: the (doc_id, gh) gram-instance
stream is enumerated ONCE and written to parquet, then ONLY the
downstream stage is timed from that parquet —

  join (shipped):  groupBy(gh).count (map-side combine) -> join back
                   -> per-doc agg -> top-50
  window (rejected): count() OVER (PARTITION BY gh)
                   -> per-doc agg -> top-50

at 32 and 256 shuffle partitions, min-of-N each, plus the hot-key
statistics (rows on the max gh key; max/median partition imbalance of
the hash exchange) that decide which plan straggles at cluster task
counts.

Usage: PYTHONPATH=/root/repo python scripts/bench_skew_stage.py [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.session import get_spark

SKEW_DIR = os.environ.get("SKEW_DIR", "/tmp/sfskew")
GRAMS_DIR = SKEW_DIR + "_cov_grams"
N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def materialize_gram_stream(spark: SparkSession) -> None:
    """op_doc_duplication_coverage's enumeration stage, run once:
    per-doc-distinct 8-gram xxhash64 instances."""
    if os.path.exists(os.path.join(GRAMS_DIR, "_SUCCESS")):
        return
    d = load(spark, SKEW_DIR, "documents")
    t = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 7),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(8))),
        )
    )
    (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 8)
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("gh"))
        .write.mode("overwrite")
        .parquet(GRAMS_DIR)
    )


def stage_join(dg: DataFrame) -> DataFrame:
    counts = dg.groupBy("gh").agg(F.count("*").alias("nd"))
    return (
        dg.join(counts, "gh")
        .withColumn("is_shared", F.col("nd") >= 2)
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


def stage_window(dg: DataFrame) -> DataFrame:
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


def timed(fn, dg: DataFrame) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn(dg).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("bench-skew-stage")
    spark.sparkContext.setLogLevel("ERROR")
    materialize_gram_stream(spark)
    dg = spark.read.parquet(GRAMS_DIR)
    total = dg.count()  # also warms the scan

    hot = (
        dg.groupBy("gh")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    print(
        f"gram instances: {total:,}; hot key rows: {hot['count']:,} "
        f"({hot['count'] / total:.1%})"
    )
    for parts in (32, 256):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        # imbalance of the exchange both plans hash on
        sizes = (
            dg.groupBy(F.pmod(F.col("gh"), F.lit(parts)).alias("p"))
            .count()
            .collect()
        )
        counts = sorted(r["count"] for r in sizes)
        med = counts[len(counts) // 2]
        print(
            f"--- {parts} shuffle partitions "
            f"(exchange max/median = {counts[-1] / med:.0f}x) ---"
        )
        tj = timed(stage_join, dg)
        tw = timed(stage_window, dg)
        print(
            f"stage-only: join={tj:.2f}s window={tw:.2f}s "
            f"(window/join = {tw / tj:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
