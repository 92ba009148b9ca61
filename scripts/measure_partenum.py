"""Measure PartEnum's expected cost on the containment candidate
profile BEFORE building anything (TODO_r11 stretch (a); the r10
verdict teed this up after suffix filtering was measured-and-rejected
for the same op).

PartEnum (Arasu, Ganti, Kaushik, "Efficient Exact Set-Similarity
Joins", VLDB 2006) turns a Hamming-distance bound k into equi-joinable
signatures: partition the element universe into n1 groups (pigeonhole:
distance <= k means some group carries <= k1 = floor(k/n1) mismatches),
then within each group enumerate the C(n2, k2) ways to delete k2 of n2
subgroups. Signature count per record = n1 * C(n2, k2); the published
evaluation operates at ABSOLUTE k <= ~4, where that product is small.

For op_dedup_containment (C(X,Y) = |X cap Y|/|X| >= t = 0.9), the
implied SYMMETRIC Hamming bound for a qualifying pair is

    |X delta Y| = |X| + |Y| - 2|X cap Y| <= |Y| - (2t-1)|X|
                = |Y| - 0.8|X|

— the container side is unbounded, so k is NOT a small constant: it
grows with |Y| and is >= 0.2|X| even in the best (equal-size) case.
This script MEASURES that k on the real corpora:

1. per-doc distinct-shingle-size profile (sf1 + sfskew),
2. k_pair = |Y| - 0.8|X| for the op's ACTUAL final pairs at sfskew
   (ground truth from the shipped op itself),
3. the resulting PartEnum signature count per doc (minimized over the
   (n1, n2, k2) grid with n1*n2 >= k+1, k2 = floor(k/n1)) vs the
   current one-sided prefix index occupancy (k_prefix + 1 postings/doc)

and prints the decision inputs. Run:

    PYTHONPATH=/root/repo python scripts/measure_partenum.py [sfskew_dir]

Driver-side cost: one run of the containment op at sfskew (~52 s,
PERF.md r10) plus two size profiles.
"""

from __future__ import annotations

import math
import sys


def min_signatures(k: int, max_n1: int = 64) -> tuple[int, int, int]:
    """Smallest PartEnum signature count per record for Hamming bound
    k: min over n1 of n1 * C(n2, k2) with k2 = floor(k/n1) and
    n2 = k2 + 1 + k2 (the paper's n2 ~ 2*k2 + 1 sizing; any valid
    scheme needs n2 > k2 or C(n2,k2) degenerates). Returns
    (count, n1, n2)."""
    best = (10**30, 0, 0)
    for n1 in range(1, max_n1 + 1):
        k2 = k // n1
        n2 = 2 * k2 + 1
        if n2 < 1:
            n2 = 1
        sigs = n1 * math.comb(n2, min(k2, n2))
        if sigs < best[0]:
            best = (sigs, n1, n2)
    return best


def main() -> int:
    from pyspark.sql import functions as F

    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.operators.textprep import (
        shingles,
        tokens,
    )
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )
    from universal_data_to_orc_converter_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    sizes = (
        load(spark, sf, "documents")
        .select(F.size(shingles(tokens(F.col("text")))).alias("n"))
    )
    prof = sizes.agg(
        F.count("*").alias("docs"),
        F.expr("percentile(n, array(0.5, 0.9, 0.99))").alias("p"),
        F.max("n").alias("mx"),
        F.avg("n").alias("avg"),
    ).collect()[0]
    p50, p90, p99 = [int(x) for x in prof.p]
    print(f"[profile] {sf}: docs={prof.docs} shingle-set size "
          f"p50={p50} p90={p90} p99={p99} max={prof.mx} avg={prof.avg:.0f}")

    # equal-size best case: k = 0.2|X|
    for nm, n in (("p50", p50), ("p90", p90)):
        k_best = max(0, math.ceil(n - 0.8 * n))
        sigs, n1, n2 = min_signatures(k_best)
        k_prefix = n - math.ceil(0.9 * n) + 1
        print(f"[best-case k, {nm}] |X|=|Y|={n}: k={k_best} -> "
              f"PartEnum >= {sigs} sigs/doc (n1={n1}, n2={n2}) vs "
              f"prefix index {k_prefix} postings/doc "
              f"({sigs / max(k_prefix, 1):.0f}x)")

    # measured k over the op's ACTUAL qualifying pairs at this corpus
    fn = load_all_queries()["op_dedup_containment"].fn
    pairs = fn(spark, sf)
    sz = (
        load(spark, sf, "documents")
        .select(
            F.col("doc_id"),
            F.size(shingles(tokens(F.col("text")))).alias("n"),
        )
    )
    kdist = (
        pairs.join(sz.withColumnRenamed("doc_id", "doc_sub")
                     .withColumnRenamed("n", "n_sub"), "doc_sub")
        .join(sz.withColumnRenamed("doc_id", "doc_super")
                .withColumnRenamed("n", "n_sup"), "doc_super")
        .select(
            (F.col("n_sup") - 0.8 * F.col("n_sub")).alias("k_pair")
        )
        .agg(
            F.count("*").alias("pairs"),
            F.expr("percentile(k_pair, array(0.5, 0.9))").alias("p"),
            F.min("k_pair").alias("mn"),
            F.max("k_pair").alias("mx"),
        )
        .collect()[0]
    )
    kp50, kp90 = [float(x) for x in kdist.p]
    print(f"[true pairs] {kdist.pairs} qualifying pairs: required "
          f"Hamming bound k_pair min={kdist.mn:.0f} p50={kp50:.0f} "
          f"p90={kp90:.0f} max={kdist.mx:.0f}")
    for nm, kv in (("p50", kp50), ("p90", kp90), ("max", float(kdist.mx))):
        k = max(0, math.ceil(kv))
        sigs, n1, n2 = min_signatures(k)
        print(f"[sig count at true-pair {nm}] k={k} -> >= {sigs} "
              f"sigs/doc (n1={n1}, n2={n2})")
    print("[note] a LOSSLESS PartEnum index must size k for the worst "
          "partner a doc may pair with, not the average — the p90/max "
          "rows above are the binding ones.")

    # Second level: per-pair k needs a COMMON partitioning, so a
    # lossless index replicates signatures per admissible container-
    # size BUCKET (Arasu et al. §6: size-based signature groups). For
    # the measured size histogram, compute each doc's total emitted
    # signatures as the contained side over buckets of width W, and
    # how often k_bucket >= |X| — where n1 = k+1 > |X| forces
    # singleton/empty groups, group-hash equality collapses to the
    # single-shingle inverted index (zero extra prune, and empty
    # groups match EVERYTHING), i.e. the scheme degenerates precisely
    # on the asymmetric quote-inclusion pairs this op exists to find.
    import pandas as pd  # noqa: F401  (toPandas)

    W = 8
    hist = (
        sizes.groupBy(F.floor(F.col("n") / W).alias("b"))
        .agg(F.count("*").alias("cnt"), F.max("n").alias("bmax"))
        .orderBy("b")
        .toPandas()
    )
    bucket_max = {int(r.b): int(r.bmax) for r in hist.itertuples()}
    size_counts = sizes.groupBy("n").count().toPandas()
    total_sigs = 0
    total_prefix = 0
    degen_combos = 0
    combos = 0
    for r in size_counts.itertuples():
        nx, cnt = int(r.n), int(r.count)
        total_prefix += cnt * (nx - math.ceil(0.9 * nx) + 1)
        for b, bmax in bucket_max.items():
            if bmax < math.ceil(0.9 * nx):
                continue  # bucket cannot contain X
            k_b = math.ceil(bmax - 0.8 * nx)
            combos += cnt
            if k_b >= nx:
                degen_combos += cnt
                total_sigs += cnt * nx  # full index, no prune left
            else:
                total_sigs += cnt * (k_b + 1)
    print(f"[lossless index, W={W}] contained-side signatures "
          f"{total_sigs / 1e6:.1f}M vs prefix postings "
          f"{total_prefix / 1e6:.1f}M = {total_sigs / total_prefix:.1f}x "
          f"inflation; {100.0 * degen_combos / combos:.0f}% of "
          f"(doc, container-bucket) combos degenerate (k >= |X|: "
          f"singleton groups, no prune over the inverted index)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
