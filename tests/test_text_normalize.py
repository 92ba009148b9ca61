"""op_text_normalize — the fixture is ASCII, so the real semantics
(combining marks, ligatures, halfwidth forms, case, whitespace runs)
are pinned here on crafted strings, including Spark-vs-DuckDB parity
of the full normalization chain."""

from __future__ import annotations

import duckdb

from universal_data_to_orc_converter_spark.registry import load_all_queries

from .conftest import SF_DIR, assert_frames_match

CRAFTED = [
    (1, "café CRÈME"),            # combining acute -> precomposed
    (2, "Å  b\tc\nd"),            # Å + whitespace runs
    (3, "  leading and trailing  "),
    (4, "ﬁn ｶﾀｶﾅ"),                     # NFC preserves ligature/halfwidth
    (5, "MiXeD CaSe 123"),
]


def test_oracle_parity_on_fixture(spark, oracle):
    spec = load_all_queries()["op_text_normalize"]
    assert_frames_match(
        spec.fn(spark, SF_DIR), oracle.sql(spec.oracle), "op_text_normalize"
    )


def test_crafted_unicode_parity_spark_vs_duckdb(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _nfc(texts):
        import unicodedata

        return texts.map(lambda t: unicodedata.normalize("NFC", t))

    nfc = pandas_udf(_nfc, "string")
    df = spark.createDataFrame(CRAFTED, "doc_id bigint, text string")
    norm = F.trim(
        F.regexp_replace(F.lower(nfc("text")), "[ \t\n\r]+", " ")
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", norm.alias("n")).collect()
    }
    con = duckdb.connect()
    try:
        ref = dict(
            con.execute(
                "SELECT doc_id, trim(regexp_replace(lower(nfc_normalize("
                "text)), '[ \t\n\r]+', ' ', 'g')) "
                "FROM (SELECT unnest($1) AS doc_id, unnest($2) AS text)",
                [[c[0] for c in CRAFTED], [c[1] for c in CRAFTED]],
            ).fetchall()
        )
    finally:
        con.close()
    assert got == ref
    # and the canonical-equivalence point: crafted combining-mark text
    # must now equal its precomposed twin
    assert got[1] == "café crème"
    assert got[2].startswith("å b c d")
