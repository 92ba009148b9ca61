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
