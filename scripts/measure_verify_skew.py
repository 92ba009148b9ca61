"""Measure whether the containment VERIFY join has a doc_a skew worth
hash-partitioning (the "next lever" PERF.md r10/r11 left on the table
after suffix filtering and PartEnum were measured-and-rejected).

The op's verify stage joins the 44.7M-candidate pair set to the
per-doc hashed shingle arrays twice (doc_a then doc_b) and runs one
JVM array_intersect per pair. The open question: does sfskew's hot
document concentrate so many candidate pairs on one doc_a that the
join's hash clustering makes a straggler task — and if so, does
pre-partitioning (or AQE's skew-join splitter) buy anything?

Experimental design: build the candidate set ONCE and park it (plus
the hashed shingle sets) as parquet in /tmp, so every verify variant
times the identical input with candidate generation excluded:

  A. shipped shape   — cand ⋈ sa ⋈ sb, AQE on (the op's plan)
  B. named lever     — cand.repartition(doc_a) before the joins
  C. skew-split off  — A with spark.sql.adaptive.skewJoin.enabled=false
                       (isolates how much AQE's splitter is already
                       carrying)

Each variant runs min-of-3 warm. Alongside, the per-key candidate
histogram (max/p99/avg pairs per doc_a and doc_b) says whether a
straggler is even geometrically possible.

Run:  PYTHONPATH=/root/repo python scripts/measure_verify_skew.py [sfskew_dir]
Cost: one candidate-stage run (~25 s warm at sfskew) + 9 verify runs.
"""

from __future__ import annotations

import shutil
import sys
import time


def main() -> int:
    from pyspark.sql import functions as F

    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.operators.dedup import (
        _assert_shingle_hash_injective,
        _ceil_mul_div,
        _hashed_shingle_sets,
        _ranked_shingles,
        _rarest_prefix,
    )
    from universal_data_to_orc_converter_spark.operators.textprep import (
        shingles,
        tokens,
    )
    from universal_data_to_orc_converter_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
    scratch = "/tmp/verify_skew_scratch"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    t_num, t_den = 9, 10
    t = t_num / t_den

    # --- candidate stage, once (mirrors op_dedup_containment) --------
    par = spark.sparkContext.defaultParallelism
    d = load(spark, sf, "documents").repartition(par, "doc_id")
    sh = d.select(
        "doc_id", shingles(tokens(F.col("text"))).alias("s")
    ).withColumn("size", F.size("s"))
    _assert_shingle_hash_injective(sh, corpus_key=sf)
    ranked = _ranked_shingles(sh).select(
        "doc_id", "size", "rn", F.xxhash64("shingle").alias("sh_h")
    )
    prefix = _rarest_prefix(sh, t_num, t_den, ranked=ranked)
    a, b = prefix.alias("a"), ranked.alias("b")
    sz_a, sz_b = F.col("a.size"), F.col("b.size")
    need = _ceil_mul_div(F.least(sz_a, sz_b), t_num, t_den)
    ubound = F.lit(1) + F.least(sz_a - F.col("a.rn"), sz_b - F.col("b.rn"))
    cand = (
        a.join(
            b,
            (F.col("a.sh_h") == F.col("b.sh_h"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (ubound >= need),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    t0 = time.monotonic()
    cand.write.mode("overwrite").parquet(f"{scratch}/cand")
    _hashed_shingle_sets(sh).write.mode("overwrite").parquet(
        f"{scratch}/hs"
    )
    print(f"[setup] candidate stage + park: {time.monotonic() - t0:.1f} s")

    candp = spark.read.parquet(f"{scratch}/cand")
    hsp = spark.read.parquet(f"{scratch}/hs")

    # --- per-key histogram: is a straggler geometrically possible? ---
    for key in ("doc_a", "doc_b"):
        h = (
            candp.groupBy(key)
            .count()
            .agg(
                F.count("*").alias("keys"),
                F.sum("count").alias("pairs"),
                F.avg("count").alias("avg"),
                F.expr("percentile(count, array(0.5, 0.99))").alias("p"),
                F.max("count").alias("mx"),
            )
            .collect()[0]
        )
        p50, p99 = [float(x) for x in h.p]
        print(
            f"[histogram {key}] keys={h.keys} pairs={h.pairs} "
            f"avg={h.avg:.1f} p50={p50:.0f} p99={p99:.0f} max={h.mx} "
            f"(max/avg={h.mx / h.avg:.1f}x, max share of all pairs="
            f"{h.mx / h.pairs:.3%})"
        )

    # --- verify variants ---------------------------------------------
    def verify(c):
        sa = hsp.select(
            F.col("doc_id").alias("doc_a"),
            F.col("hs").alias("s_a"),
            F.col("size").alias("size_a"),
        )
        sb = hsp.select(
            F.col("doc_id").alias("doc_b"),
            F.col("hs").alias("s_b"),
            F.col("size").alias("size_b"),
        )
        sized = (
            c.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                "size_a",
                "size_b",
                F.size(F.array_intersect("s_a", "s_b")).alias("n_shared"),
            )
        )
        fwd = sized.select(
            (F.col("n_shared") / F.col("size_a")).alias("containment")
        )
        rev = sized.select(
            (F.col("n_shared") / F.col("size_b")).alias("containment")
        )
        return fwd.unionAll(rev).filter(F.col("containment") >= t)

    def timed(tag, mk, skew_join=True):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower()
        )
        walls = []
        n = None
        for _ in range(3):
            t0 = time.monotonic()
            n = mk().count()
            walls.append(time.monotonic() - t0)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        print(
            f"[{tag}] finals={n} walls="
            + "/".join(f"{w:.2f}" for w in walls)
            + f" min={min(walls):.2f} s"
        )
        return min(walls)

    wa = timed("A shipped shape (AQE skew-split on)", lambda: verify(candp))
    wb = timed(
        "B repartition(doc_a) first",
        lambda: verify(candp.repartition(par, "doc_a")),
    )
    wc = timed(
        "C shipped shape, skew-split OFF",
        lambda: verify(candp),
        skew_join=False,
    )
    print(
        f"[decision inputs] B vs A: {wb / wa:.2f}x; C vs A: {wc / wa:.2f}x "
        "(B<A => the lever is real; C>A => AQE's splitter was already "
        "load-bearing; otherwise the verify join has no skew problem "
        "and the lever is dead)"
    )
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
