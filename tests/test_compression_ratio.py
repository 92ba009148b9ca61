"""op_compression_ratio — rows-only op pinned bit-exact against
direct Python zlib (the same library the pandas_udf calls)."""

from __future__ import annotations

import zlib

import duckdb

from universal_data_to_orc_converter_spark.registry import load_all_queries

from .conftest import SF_DIR


def test_matches_direct_python_zlib(spark):
    spec = load_all_queries()["op_compression_ratio"]
    got = {
        r["doc_id"]: (r["n_raw"], r["n_zlib"], r["ratio"])
        for r in spec.fn(spark, SF_DIR).collect()
    }
    assert len(got) == 50
    con = duckdb.connect()
    try:
        docs = con.sql(
            f"SELECT doc_id, text FROM "
            f"'{SF_DIR}/documents.parquet'"
        ).fetchall()
    finally:
        con.close()
    ref = {}
    for doc_id, text in docs:
        raw = text.encode("utf-8")
        nz = len(zlib.compress(raw, 6))
        ref[doc_id] = (len(raw), nz, nz / len(raw))
    expected = dict(
        sorted(ref.items(), key=lambda kv: (kv[1][2], kv[0]))[:50]
    )
    assert got == expected


def test_ratio_orders_repetitive_below_diverse(spark):
    """Sanity on crafted docs: a 1-token loop must compress far below
    a high-entropy string."""
    from universal_data_to_orc_converter_spark.operators.text import (
        op_compression_ratio,  # noqa: F401 - registration side effect
    )
    import hashlib

    diverse = " ".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(60)
    )
    spam = "spam " * 480
    df = spark.createDataFrame(
        [(1, spam), (2, diverse)], "doc_id bigint, text string"
    )
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _zlib_len(texts):
        import zlib as z

        return texts.map(
            lambda t: len(z.compress(t.encode("utf-8"), 6))
        ).astype("int64")

    zlib_len = pandas_udf(_zlib_len, "bigint")

    out = {
        r["doc_id"]: r["n_zlib"] / r["n_raw"]
        for r in df.select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_raw"),
            zlib_len("text").alias("n_zlib"),
        ).collect()
    }
    assert out[1] < 0.05 < 0.5 < out[2]
