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


@query(
    "op_curation_report",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS t
          FROM documents
        ),
        base AS (
          SELECT doc_id, len(t) AS n_tokens,
                 CASE WHEN len(t) >= 3 THEN
                   CAST(len(list_transform(generate_series(1, len(t) - 2),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        - len(list_distinct(list_transform(
                            generate_series(1, len(t) - 2),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                        AS DOUBLE)
                   / (len(t) - 2)
                 ELSE 0.0 END AS dup_frac
          FROM toks
        ),
        dg AS (
          SELECT DISTINCT doc_id,
                 array_to_string(t[u.i : u.i + 7], ' ') AS gram
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) u
          WHERE len(t) >= 8
        ),
        marked AS (
          SELECT doc_id,
                 COUNT(*) OVER (PARTITION BY gram) >= 2 AS is_shared
          FROM dg
        ),
        cov AS (
          SELECT doc_id,
                 CAST(COUNT(*) FILTER (is_shared) AS DOUBLE) / COUNT(*)
                   AS shared_frac
          FROM marked GROUP BY doc_id
        ),
        flags AS (
          SELECT b.n_tokens >= 30 AS g1,
                 b.n_tokens >= 30 AND b.dup_frac <= 0.2 AS g2,
                 b.n_tokens >= 30 AND b.dup_frac <= 0.2
                   AND COALESCE(c.shared_frac, 0.0) <= 0.5 AS g3
          FROM base b LEFT JOIN cov c USING (doc_id)
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n0,
                 CAST(COUNT(*) FILTER (g1) AS BIGINT) AS n1,
                 CAST(COUNT(*) FILTER (g2) AS BIGINT) AS n2,
                 CAST(COUNT(*) FILTER (g3) AS BIGINT) AS n3
          FROM flags
        )
        SELECT '1_min_length' AS gate, n0 AS n_in, n1 AS n_out,
               n0 - n1 AS n_dropped FROM agg
        UNION ALL
        SELECT '2_self_repetition', n1, n2, n1 - n2 FROM agg
        UNION ALL
        SELECT '3_dup_coverage', n2, n3, n2 - n3 FROM agg
    """,
    notes="Curation ATTRITION report — the artifact every corpus-"
    "curation run publishes (how many documents each gate dropped, "
    "cumulatively): a sequential funnel of the r6 quality signals — "
    "min-length, intra-doc self-repetition (duplicated-3-gram "
    "fraction <= 0.2), cross-corpus duplication coverage (shared-"
    "8-gram fraction <= 0.5) — evaluated per doc and rolled into one "
    "(gate, n_in, n_out, n_dropped) table. Shape: the in-row signals "
    "ride the corpus scan; the only corpus-wide work is the one "
    "xxhash64-keyed sharing window op_doc_duplication_coverage "
    "already pays; the funnel itself is a single 4-counter "
    "conditional aggregate and a 3-row in-row unpivot — adding a "
    "gate adds a counter, never a pass. The gates' thresholds are "
    "illustrative; the REPORT structure (monotone n_in chain, "
    "n_dropped accounting) is what downstream dashboards consume.",
    tags=("text", "quality", "scale"),
)
def op_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gate attrition funnel over the documents corpus."""
    d = load(spark, sf_dir, "documents")
    t = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    tri = F.transform(
        F.sequence(F.lit(1), F.size("t") - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(3))),
    )
    # project the trigram array ONCE so the dup fraction doesn't
    # re-enumerate it per reference
    base = (
        d.select("doc_id", t.alias("t"))
        .select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.when(F.size("t") >= 3, tri)
            .otherwise(F.array().cast("array<string>"))
            .alias("tri"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("n_tokens") >= 3,
                (F.size("tri") - F.size(F.array_distinct("tri"))).cast(
                    "double"
                )
                / (F.col("n_tokens") - 2),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )
    grams8 = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 7),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(8))),
        )
    )
    dg = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 8)
        .select("doc_id", F.explode(grams8).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("gh"))
    )
    # sharedness via map-side-combined groupBy + join, not a window —
    # the hot-gram skew hardening op_doc_duplication_coverage documents
    counts = dg.groupBy("gh").agg(F.count("*").alias("nd"))
    cov = (
        dg.join(counts, "gh")
        .withColumn("is_shared", F.col("nd") >= 2)
        .groupBy("doc_id")
        .agg(
            (
                F.count(F.when(F.col("is_shared"), 1)).cast("double")
                / F.count("*")
            ).alias("shared_frac")
        )
    )
    g1 = F.col("n_tokens") >= 30
    g2 = g1 & (F.col("dup_frac") <= 0.2)
    g3 = g2 & (F.coalesce(F.col("shared_frac"), F.lit(0.0)) <= 0.5)
    agg = (
        base.join(cov, "doc_id", "left")
        .agg(
            F.count("*").cast("bigint").alias("n0"),
            F.count(F.when(g1, 1)).cast("bigint").alias("n1"),
            F.count(F.when(g2, 1)).cast("bigint").alias("n2"),
            F.count(F.when(g3, 1)).cast("bigint").alias("n3"),
        )
    )
    rows = F.array(
        F.struct(
            F.lit("1_min_length").alias("gate"),
            F.col("n0").alias("n_in"),
            F.col("n1").alias("n_out"),
        ),
        F.struct(
            F.lit("2_self_repetition").alias("gate"),
            F.col("n1").alias("n_in"),
            F.col("n2").alias("n_out"),
        ),
        F.struct(
            F.lit("3_dup_coverage").alias("gate"),
            F.col("n2").alias("n_in"),
            F.col("n3").alias("n_out"),
        ),
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.gate",
        "r.n_in",
        "r.n_out",
        (F.col("r.n_in") - F.col("r.n_out")).alias("n_dropped"),
    )
