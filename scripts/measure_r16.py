"""Warm min-of-N measurement of registered ops through the noop sink
(guide §1.4) — the r16 A/B harness.

Usage: python scripts/measure_r16.py [-n N] [--sf DIR] name [name ...]
Prints one line per op: name, laps, min. Construction (fn call) and
execution (noop save) are reported separately so driver-side costs are
attributed correctly (r15 method).
"""
import argparse
import time

from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.registry import load_all_queries
from universal_data_to_orc_converter_spark.session import get_spark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("measure-r16")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all_queries()
    # warm JVM + Python worker pool (same ritual as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(256)
        .withColumn("g", F.col("id") % 32)
        .groupBy("g")
        .applyInPandas(lambda pdf: pdf, "id long, g long")
        .write.mode("overwrite").format("noop").save()
    )

    for name in args.names:
        fn = specs[name].fn
        cons, execs, totals = [], [], []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"r16:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            totals.append(t2 - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: total min={min(totals):.3f} laps="
            f"{[round(x, 3) for x in totals]} construct min={min(cons):.3f} "
            f"exec min={min(execs):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
