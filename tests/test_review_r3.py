"""Regression tests for the round-3 self-review findings: degenerate
inputs where Spark and DuckDB could diverge (empty documents, all-equal
histogram values) and answers-file parsing edge cases."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from universal_data_to_orc_converter_spark.registry import load_all_queries

SPECS = load_all_queries()


def _compare(spark, sf_dir, name, tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    sdf = SPECS[name].fn(spark, sf_dir)
    cols = sorted(sdf.columns)
    srows = sorted(map(tuple, sdf.select(*cols).collect()))
    opdf = con.sql(SPECS[name].oracle).df()
    orows = sorted(map(tuple, opdf[cols].itertuples(index=False)))
    assert srows == orows, (name, srows[:3], orows[:3])


def test_span_corruption_empty_document(spark, tmp_path):
    """An all-whitespace document has zero tokens; sequence(0,-1) must
    NOT manufacture phantom blocks (it auto-steps downward) — both
    engines must yield zero blocks, empty corrupted/target."""
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["", "   ", "three little tokens here now"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [0, 3, 29],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    _compare(spark, str(tmp_path), "op_span_corruption", ["documents"])


def test_histogram_all_equal_values(spark, tmp_path):
    """hi == lo makes the bucket width 0; Spark's NaN->0 cast and
    DuckDB's CAST error must both be short-circuited to bucket 0."""
    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 2],
            "o_orderstatus": ["F", "O", "F"],
            "o_totalprice": [100.0, 100.0, 100.0],
            "o_orderdate": pd.to_datetime(["2020-01-01"] * 3).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    ).to_parquet(tmp_path / "orders.parquet")
    _compare(spark, str(tmp_path), "op_histogram", ["orders"])


def test_answers_file_hash_answer_and_crlf(tmp_path):
    """A lone '#' line and '# ...' lines are comments; '#x' or '#' as
    a recorded ANSWER must survive; CRLF endings are stripped."""
    from universal_data_to_orc_converter_spark.wizard import (
        answers_from_file,
    )

    af = tmp_path / "a.txt"
    af.write_bytes(b"# comment\r\n#\r\n3\r\n#|\r\n\r\n")
    ask = answers_from_file(str(af))
    assert ask("choice") == "3"
    assert ask("delimiter") == "#|"
    assert ask("header") == ""
