"""End-to-end corpus curation — the LLM-training-data pipeline as ONE
composite query (SURVEY.md §2.I capstone): quality gate → exact dedup
→ shard assignment, producing the per-document training manifest.

Each stage reuses the exact conventions of its standalone op
(op_quality_filter's thresholds, op_dedup_exact's sha256 + smallest-
doc_id keeper, op_shard_assign's Knuth-hash shards), so the composite
is verified end-to-end by one oracle rather than stage-by-stage — the
pipeline integration, not just the parts.

Scale shape: the quality gate is scan-side (runs at I/O speed and
shrinks everything downstream — always filter FIRST); dedup shuffles
32-byte digests + ids, never text; the shard id is a projection. One
real exchange end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .sampling import _KNUTH
from .textprep import tokens


@query(
    "op_corpus_curate",
    oracle=f"""
        WITH scored AS (
          SELECT doc_id, lang, sha256(text) AS h,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))
                      AS DOUBLE) / length(text) AS punct_ratio,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        passed AS (
          SELECT * FROM scored
          WHERE n_chars >= 100 AND punct_ratio < 0.1 AND n_tokens >= 20
        ),
        keep AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id)
                        AS rn
          FROM passed
        )
        SELECT doc_id, lang, n_tokens,
               ((doc_id * {_KNUTH}) % 64 + 64) % 64 AS shard_id
        FROM keep WHERE rn = 1
    """,
    notes="The curation capstone: quality gate (op_quality_filter's "
    "thresholds) -> exact dedup among survivors (op_dedup_exact's "
    "sha256 + smallest-doc_id keeper, via a WindowGroupLimit-planned "
    "rn=1 on the digest) -> Knuth-hash shard assignment "
    "(op_shard_assign's selector). One oracle checks the composed "
    "pipeline end-to-end. Filter-first ordering means dedup's digest "
    "shuffle carries only gate survivors.",
    tags=("text", "dedup", "sampling", "composite", "scale"),
)
def op_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> quality gate -> exact dedup -> sharded manifest."""
    d = load(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("bigint")
    punct = F.size(
        F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), F.lit(0))
    )
    ntok = F.size(tokens(F.col("text"))).cast("bigint")
    passed = d.select(
        "doc_id",
        "lang",
        F.sha2("text", 256).alias("h"),
        n_chars.alias("n_chars"),
        (punct.cast("double") / F.length("text")).alias("punct_ratio"),
        ntok.alias("n_tokens"),
    ).filter(
        (F.col("n_chars") >= 100)
        & (F.col("punct_ratio") < 0.1)
        & (F.col("n_tokens") >= 20)
    )
    rn = F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
    return (
        passed.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(64)).alias(
                "shard_id"
            ),
        )
    )
