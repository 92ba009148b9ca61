"""Measure the r9 int64-relabeling of the exact-pair dedup ops.

Round-8 verdict #4: on /tmp/sfskew the prefix-filtered exact-Jaccard
wall is VERIFY-bound — ~126 M surviving candidate incidences ship full
shingle-STRING arrays into array_intersect, and the candidate equi-join
itself keys on strings. Round 9 relabels both through xxhash64 (int64)
behind a per-run injectivity certificate (see
dedup._assert_shingle_hash_injective — under the certificate the
relabeling is exact, not approximate). This script runs the OLD
string-keyed formulations (frozen replicas below, faithful to the r8
commit they were copied from) and the NEW hashed ops on the same
fixtures and prints min-of-N walls — the numbers PERF.md's "hashed
verify" section records.

Usage:
    PYTHONPATH=/root/repo python scripts/bench_hashed_verify.py \
        [n_runs] [jaccard|containment|both] [sf_dir ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.operators.dedup import (
    _JACCARD_T,
    _JACCARD_T_DEN,
    _JACCARD_T_NUM,
    _ceil_mul_div,
    _ranked_shingles,
    _rarest_prefix,
    op_dedup_containment,
    op_dedup_jaccard_prefix,
)
from universal_data_to_orc_converter_spark.operators.textprep import (
    shingles,
    tokens,
)
from universal_data_to_orc_converter_spark.session import get_spark

# argv parsed in main() so the frozen replicas stay importable from
# other scripts (measure_shuffle_bytes.py) without argv coupling


def jaccard_prefix_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROZEN r8 formulation: string join keys + string verify arrays
    (replica of op_dedup_jaccard_prefix at commit 0192a7b)."""
    t = _JACCARD_T
    par = spark.sparkContext.defaultParallelism
    d = load(spark, sf_dir, "documents").repartition(par, "doc_id")
    sh = d.select(
        "doc_id", shingles(tokens(F.col("text"))).alias("s")
    ).withColumn("size", F.size("s"))
    prefix = _rarest_prefix(sh, _JACCARD_T_NUM, _JACCARD_T_DEN)
    a, b = prefix.alias("a"), prefix.alias("b")
    sa, sb = F.col("a.size"), F.col("b.size")
    alpha = _ceil_mul_div(
        sa + sb, _JACCARD_T_NUM, _JACCARD_T_NUM + _JACCARD_T_DEN
    )
    ubound = F.lit(1) + F.least(sa - F.col("a.rn"), sb - F.col("b.rn"))
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (sb * F.lit(_JACCARD_T_DEN) >= sa * F.lit(_JACCARD_T_NUM))
            & (sa * F.lit(_JACCARD_T_DEN) >= sb * F.lit(_JACCARD_T_NUM))
            & (ubound >= alpha),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa_f = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("s").alias("s_a"),
        F.col("size").alias("size_a"),
    )
    sb_f = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("s_b"),
        F.col("size").alias("size_b"),
    )
    n_shared = F.size(F.array_intersect("s_a", "s_b"))
    jac = n_shared.cast("double") / (
        F.col("size_a") + F.col("size_b") - n_shared
    )
    return (
        cand.join(sa_f, "doc_a")
        .join(sb_f, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= t)
    )


def containment_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROZEN r8 formulation of op_dedup_containment (string keys)."""
    t_num, t_den = 9, 10
    t = t_num / t_den
    par = spark.sparkContext.defaultParallelism
    d = load(spark, sf_dir, "documents").repartition(par, "doc_id")
    sh = d.select(
        "doc_id", shingles(tokens(F.col("text"))).alias("s")
    ).withColumn("size", F.size("s"))
    ranked = _ranked_shingles(sh)
    prefix = _rarest_prefix(sh, t_num, t_den, ranked=ranked)
    a, b = prefix.alias("a"), ranked.alias("b")
    sz_a, sz_b = F.col("a.size"), F.col("b.size")
    need = _ceil_mul_div(F.least(sz_a, sz_b), t_num, t_den)
    ubound = F.lit(1) + F.least(sz_a - F.col("a.rn"), sz_b - F.col("b.rn"))
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (ubound >= need),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("s").alias("s_a"),
        F.col("size").alias("size_a"),
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("s_b"),
        F.col("size").alias("size_b"),
    )
    n_shared = F.size(F.array_intersect("s_a", "s_b")).alias("n_shared")
    sized = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "size_a", "size_b", n_shared)
    )
    fwd = sized.select(
        F.col("doc_a").alias("doc_sub"),
        F.col("doc_b").alias("doc_super"),
        (F.col("n_shared").cast("double") / F.col("size_a")).alias(
            "containment"
        ),
    )
    rev = sized.select(
        F.col("doc_b").alias("doc_sub"),
        F.col("doc_a").alias("doc_super"),
        (F.col("n_shared").cast("double") / F.col("size_b")).alias(
            "containment"
        ),
    )
    return fwd.unionAll(rev).filter(F.col("containment") >= t)


VARIANTS = {
    "jaccard": [
        ("jaccard strings (r8)", jaccard_prefix_strings),
        ("jaccard hashed (r9)", op_dedup_jaccard_prefix),
    ],
    "containment": [
        ("containment strings (r8)", containment_strings),
        ("containment hashed (r9)", op_dedup_containment),
    ],
}


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    dirs = sys.argv[3:] or ["/tmp/sf1", "/tmp/sfskew"]
    spark = get_spark("bench-hashed-verify")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = (
        VARIANTS["jaccard"] + VARIANTS["containment"]
        if which == "both"
        else VARIANTS[which]
    )
    for sf_dir in dirs:
        for label, fn in pairs:
            walls, rows = [], None
            for _ in range(n_runs):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).count()
                walls.append(time.perf_counter() - t0)
            print(
                f"{sf_dir:14s} {label:28s} rows={rows:<8d} "
                f"min={min(walls):7.1f}s runs={[round(w,1) for w in walls]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
