"""Package-wide census for the CollapseProject HOF-inlining class.

The r9/r10 `_unit_vectors` incident: materializing an expensive
expression as an intermediate projected column is UNDONE by the
optimizer when the column is consumed exactly once inside a
higher-order-function lambda — CollapseProject inlines it back, and
the expression then evaluates once per array ELEMENT (O(dim²) /
O(tokens²) per row). The source-level AST lint
(tests/test_expr_duplication_lint.py) cannot see this; only the
OPTIMIZED plan can. The two known-hot sites are pinned as fast plan
tests (tests/test_plans.py::test_*_hoisted_out_of_lambda); this script
is the exhaustive sweep — every registered query's optimized plan is
scanned for expensive expressions nested under ``lambdafunction(``.

~6.5 min at sf0.001 (plan construction only, but many ops run eager
stages at construction: streaming choreography, k-means fits,
corpus certificates) — run once per round, not in the suite:

    PYTHONPATH=/root/repo python scripts/hof_inlining_census.py

Exits non-zero listing (query, needle) hits. r10 baseline: 0 hits
across all 258 queries (PERF.md r10 "HOF-inlining census").
"""

from __future__ import annotations

import sys
import time

#: Expressions that are O(collection) or worse per evaluation — one of
#: these inside a per-element lambda is the quadratic smell.
NEEDLES = (
    "aggregate(",
    "split(",
    "sort_array(",
    "array_sort(",
    "sha2(",
    "regexp_extract_all(",
)
# Deliberately NOT needles: ``transform(`` (the textprep.let pattern
# itself nests a transform inside the binding lambda — flagging it
# would flag every cure site) and per-element scalar hashes like
# ``xxhash64(`` (O(1) per element, e.g. _hashed_shingle_sets'
# elementwise relabel — hashing each element once is the point).

#: (query, needle) pairs that are REVIEWED and genuinely per-element
#: by design (none currently). Add with a comment justifying why the
#: inner evaluation is not a duplication of row-level work.
ALLOWLIST: frozenset[tuple[str, str]] = frozenset()

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    from pyspark.sql import SparkSession

    from universal_data_to_orc_converter_spark.plans.inspect import (
        expr_inside_lambda,
        lambda_spans,
    )
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    hits: list[tuple[str, str]] = []
    errs: list[tuple[str, str]] = []
    warns: list[tuple[str, int]] = []
    specs = load_all_queries()
    for name, spec in specs.items():
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
        except Exception as e:  # noqa: BLE001 — census must keep going
            errs.append((name, str(e)[:80]))
            continue
        for nd in NEEDLES:
            if expr_inside_lambda(plan, nd) and (name, nd) not in ALLOWLIST:
                hits.append((name, nd))
        # ADVICE r10: a span cut at end-of-line with depth>0 was NOT
        # fully scanned (cached-subtree printers elide field lists) —
        # report it instead of silently treating the remainder as
        # clean. WARN, not ERR: op_dedup_clusters' cached label-prop
        # plan legitimately truncates; a hit hiding in a truncated
        # remainder would need the needle to survive the printer's
        # elision anyway, so the warn is the audit trail.
        n_trunc = sum(1 for _, t in lambda_spans(plan) if t)
        if n_trunc:
            warns.append((name, n_trunc))
    print(
        f"hof-inlining census: {len(specs)} queries in "
        f"{time.time() - t0:.0f}s, {len(hits)} hits, {len(errs)} errors, "
        f"{len(warns)} queries with truncated spans"
    )
    for name, nd in hits:
        print(f"  HIT {name}: {nd} inside a lambdafunction")
    for name, msg in errs:
        print(f"  ERR {name}: {msg}")
    for name, k in warns:
        print(f"  WARN {name}: {k} truncated lambdafunction span(s) "
              f"(remainder unscanned — cached-subtree printer)")
    return 1 if (hits or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
