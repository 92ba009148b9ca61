"""Physical-plan assertions.

The engine's 100 TB posture is a set of plan properties, not hopes:
filters reach the scan, projections prune the read schema, small dims
broadcast, hot expressions stay inside whole-stage codegen. These
helpers turn each property into something a test can assert, so a
regression in plan shape fails CI instead of surfacing as a 100×
slowdown on the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().simpleString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the scan's PushedFilters mentions ``fragment``."""
    plan = formatted_plan(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each scan (ReadSchema) — the
    check that projection pruning reached the format reader."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {
            c.split(":")[0].strip()
            for c in m.group(1).split(",")
            if c.strip()
        }
        out.append(cols)
    return out


def count_broadcast_joins(df: DataFrame) -> int:
    return simple_plan(df).count("BroadcastHashJoin")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan — the number to minimize."""
    return simple_plan(df).count("Exchange hashpartitioning") + simple_plan(
        df
    ).count("Exchange rangepartitioning")


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Checks the *executed* plan — under AQE the final plan (and its
    WholeStageCodegen spans) only exists after an action runs."""
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # executed plans print codegen spans as "*(n) Operator"
    return "WholeStageCodegen" in s or re.search(r"\*\(\d+\)", s) is not None


def uses_window_group_limit(df: DataFrame) -> bool:
    """Spark ≥3.5 pushes rank()<=k below the shuffle as
    WindowGroupLimit — the property that makes grouped top-k skew-safe."""
    return "WindowGroupLimit" in simple_plan(df)


def optimized_plan(df: DataFrame) -> str:
    """The post-Catalyst logical plan — where CollapseProject has
    already run, so per-element expression duplication (an expensive
    producer inlined into a HOF lambda) is visible here even when the
    source code looked hoisted."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def expr_inside_lambda(plan: str, needle: str) -> bool:
    """True if ``needle`` occurs INSIDE any ``lambdafunction(...)``
    span of a plan string (balanced-paren scan).

    This is the plan-level complement to the source-level AST lint
    (tests/test_expr_duplication_lint.py): the lint can't see
    CollapseProject re-inlining a single-use projected column into a
    HOF lambda — the r9 ``_unit_vectors`` case, where the O(dim) norm
    aggregate ended up re-evaluated per array element. Checking the
    optimized plan catches exactly that class: an expensive expression
    (``aggregate(``, ``split(``, …) nested under ``lambdafunction(``
    evaluates once per ELEMENT, not once per row.

    The balanced scan is bounded at end-of-line: expressions print
    inline (one plan OPERATOR per line), while cached subtrees
    (InMemoryRelation) embed multi-line child plans whose printer
    TRUNCATES long field lists — an unmatched paren there would make
    the span swallow unrelated lines (observed: a 415 kB "span" over
    op_dedup_clusters' cached label-prop plan flagging the tokenize
    split as in-lambda when it is not). A span cut at end-of-line with
    depth>0 is therefore possible — use ``lambda_spans`` to SEE those
    truncations instead of silently treating the remainder as clean
    (ADVICE r10: the census reports them)."""
    return any(needle in span for span, _ in lambda_spans(plan))


def lambda_spans(plan: str) -> list[tuple[str, bool]]:
    """All ``lambdafunction(...)`` spans of a plan string as
    (span_text, truncated) pairs. ``truncated=True`` means the
    balanced-paren scan hit end-of-line with depth>0 — either the plan
    printer elided a long field list (cached InMemoryRelation
    subtrees, the normal case) or a future printer wrapped the
    expression; either way the remainder of that span was NOT scanned,
    so callers that must not miss a needle (the HOF-inlining census)
    can surface the truncation rather than assume clean."""
    spans: list[tuple[str, bool]] = []
    start = 0
    while True:
        i = plan.find("lambdafunction(", start)
        if i == -1:
            return spans
        j = i + len("lambdafunction(")
        depth = 1
        while j < len(plan) and depth and plan[j] != "\n":
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        spans.append((plan[i:j], depth > 0))
        start = i + 1
