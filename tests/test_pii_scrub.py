"""op_pii_scrub — span-level PII scrubbing (r7 verdict #5).

Three layers: (1) full oracle parity at sf0.01; (2) the regex DIALECT
pin — every _PII_CLASSES pattern must classify an adversarial token
list identically in Spark (Java regex) and DuckDB (RE2), because the
op's whole correctness story rests on the two engines agreeing on the
fixed character-class subset; (3) span offsets verified independently
in Python: slicing the original line by each reported [start, end]
must yield exactly a token the classifier matches.
"""

from __future__ import annotations

import duckdb
import pytest

from universal_data_to_orc_converter_spark.operators.curate import (
    _PII_CLASSES,
)
from universal_data_to_orc_converter_spark.registry import load_all_queries

from .conftest import SF_DIR, assert_frames_match

#: adversarial tokens: true positives, near-misses (unanchored
#: substrings, wrong group widths, uppercase where the class is
#: lowercase), and dialect probes ('-' at class edges, literal [.])
ADVERSARIAL_TOKENS = [
    "user42@example.com",
    "USER42@EXAMPLE.COM",          # email class is lowercase-only
    "user@example.toolongtld",     # {2,4} bound
    "user@example.c",              # below {2,}
    "not-an-email@",               # no domain
    "a@b.co",
    "pre user@example.com",        # anchored: must NOT match
    "+1-555-0199",
    "+12-345-6789",
    "+123-456-7890",
    "+1234-555-0199",              # country code past {1,3}
    "1-555-0199",                  # missing '+'
    "+1-55-0199",                  # 2-digit middle group
    "+1-555-019",                  # 3-digit last group
    "Customer#000000042",
    "customer#1",
    "Customer#",                   # no digits
    "#42",                         # no letters
    "Cust0mer#42",                 # digit inside the letter run
    "x.y_z%w+v@a-b.org",
    "",
]


def test_oracle_parity(spark, oracle):
    spec = load_all_queries()["op_pii_scrub"]
    assert_frames_match(
        spec.fn(spark, SF_DIR), oracle.sql(spec.oracle), "op_pii_scrub"
    )


@pytest.mark.parametrize("name,pat", _PII_CLASSES)
def test_pattern_dialect_parity(spark, name, pat):
    """Each pattern must produce the SAME boolean for every adversarial
    token in Java regex (Spark) and RE2 (DuckDB)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(t,) for t in ADVERSARIAL_TOKENS], "tok string"
    )
    got_spark = [
        (r["tok"], r["m"])
        for r in df.select(
            "tok", F.regexp_like("tok", F.lit(pat)).alias("m")
        ).collect()
    ]
    con = duckdb.connect()
    try:
        got_duck = con.execute(
            "SELECT tok, regexp_matches(tok, ?) FROM (SELECT unnest(?) "
            "AS tok)",
            [pat, ADVERSARIAL_TOKENS],
        ).fetchall()
    finally:
        con.close()
    assert sorted(got_spark) == sorted(
        (t, bool(m)) for t, m in got_duck
    ), f"dialect divergence on pattern {name!r}"


def test_span_offsets_slice_to_classified_tokens(spark):
    """Independent Python check: each reported 1-based inclusive
    [start, end] span must slice the RECONSTRUCTED original line to a
    whole whitespace token that the classifier matches, and scrubbing
    those exact slices must reproduce the op's scrubbed output."""
    import re

    spec = load_all_queries()["op_pii_scrub"]
    rows = spec.fn(spark, SF_DIR).limit(50).collect()
    compiled = [(n, re.compile(p)) for n, p in _PII_CLASSES]
    for r in rows:
        # reconstruct the original from the scrubbed + spans data is
        # circular; rebuild from the same deterministic recipe instead
        k = r["c_custkey"]
        line = (
            f"account Customer#{k:09d} contact user{k}@example.com "
            f"phone +1-{k % 900 + 100}-{k % 9000 + 1000} segment "
        )
        # segment value varies; spans never touch it, so pad with the
        # scrubbed tail (token after 'segment ')
        line += r["scrubbed"].rsplit(" ", 1)[-1]
        toks = line.split(" ")
        rebuilt = list(toks)
        assert r["n_spans"] == 3
        for span in r["spans"].split(";"):
            idx_s, rng, typ = span.split(":")
            start, end = map(int, rng.split("-"))
            piece = line[start - 1 : end]
            assert piece == toks[int(idx_s) - 1], (
                f"span {span} does not slice to token "
                f"{toks[int(idx_s) - 1]!r} (got {piece!r})"
            )
            pat = dict(compiled)[typ]
            assert pat.fullmatch(piece), f"{piece!r} not a {typ}"
            rebuilt[int(idx_s) - 1] = f"<{typ.upper()}>"
        assert " ".join(rebuilt) == r["scrubbed"]
