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


#: PII span-scrub pattern dialect — the CROSS-ENGINE-SAFE subset both
#: Java regex (Spark) and RE2 (DuckDB) interpret identically: literal
#: characters, character classes (with leading/trailing '-' literal
#: and '[.]' for a literal dot — no backslash escapes to survive two
#: SQL string layers), '+' / '{m,n}' repetition, and '^'/'$' anchors.
#: No lookarounds, no backreferences, no \d/\w shorthands (RE2 and
#: Java agree on those too, but the subset stays auditable). Patterns
#: are anchored and applied to WHOLE whitespace tokens, which is what
#: makes exact span offsets recoverable by pure prefix-sum arithmetic
#: instead of engine-specific match-position APIs (neither engine
#: exposes regexp match offsets).
_PII_CLASSES: tuple[tuple[str, str], ...] = (
    ("email", "^[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,4}$"),
    ("phone", "^[+][0-9]{1,3}-[0-9]{3}-[0-9]{4}$"),
    ("account", "^[A-Za-z]+#[0-9]+$"),
)


def _pii_classify(tok):
    """CASE-chain token classifier over _PII_CLASSES (Spark column)."""
    expr = None
    for name, pat in _PII_CLASSES:
        cond = F.regexp_like(tok, F.lit(pat))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return expr


_PII_ORACLE_CASE = " ".join(
    f"WHEN regexp_matches(tok, '{pat}') THEN '{name}'"
    for name, pat in _PII_CLASSES
)

#: contact line synthesized deterministically from customer columns —
#: the fixture corpus contains no PII shapes (31-token vocab, no
#: digits), so the scrub target derives one from real fixture data:
#: account id (c_name = 'Customer#NNNNNNNNN'), email, phone. The
#: arithmetic keeps the phone groups at fixed width without lpad
#: (whose dialects differ): (k%900)+100 is always 3 digits,
#: (k%9000)+1000 always 4.
_PII_LINE_SQL = (
    # CAST AS STRING parses in BOTH engines (Spark rejects bare
    # VARCHAR; DuckDB accepts STRING as a VARCHAR alias)
    "'account ' || c_name || ' contact user' "
    "|| CAST(c_custkey AS STRING) "
    "|| '@example.com phone +1-' "
    "|| CAST((c_custkey % 900) + 100 AS STRING) || '-' "
    "|| CAST((c_custkey % 9000) + 1000 AS STRING) "
    "|| ' segment ' || c_mktsegment"
)


@query(
    "op_pii_scrub",
    oracle=f"""
        WITH lines AS (
          SELECT c_custkey, {_PII_LINE_SQL} AS line FROM customer
        ),
        toks AS (
          SELECT c_custkey, t[u.i] AS tok, u.i AS i
          FROM (SELECT c_custkey, string_split(line, ' ') AS t
                FROM lines),
               LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) u
        ),
        pos AS (
          SELECT c_custkey, i, tok,
                 1 + COALESCE(SUM(length(tok) + 1) OVER (
                       PARTITION BY c_custkey ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS s,
                 CASE {_PII_ORACLE_CASE} END AS typ
          FROM toks
        )
        SELECT c_custkey,
               CAST(COUNT(typ) AS BIGINT) AS n_spans,
               COALESCE(string_agg(
                 CASE WHEN typ IS NOT NULL THEN
                   CAST(i AS VARCHAR) || ':' || CAST(s AS VARCHAR)
                   || '-' || CAST(s + length(tok) - 1 AS VARCHAR)
                   || ':' || typ
                 END, ';' ORDER BY i), '') AS spans,
               string_agg(CASE WHEN typ IS NOT NULL
                               THEN '<' || upper(typ) || '>'
                               ELSE tok END, ' ' ORDER BY i) AS scrubbed
        FROM pos
        GROUP BY c_custkey
    """,
    notes="PII span SCRUBBING (curation family; r7 verdict #5) — not "
    "just redacted text (op_pii_redact) but the exact 1-based "
    "character spans [start,end] of every detected entity, the audit "
    "artifact a compliance pipeline keeps alongside the cleaned "
    "corpus. Neither engine exposes regexp match OFFSETS, so spans "
    "are recovered arithmetically: patterns are anchored on whole "
    "whitespace tokens and offsets fall out of an exact integer "
    "prefix sum over token lengths. The regex dialect is pinned to a "
    "Java/RE2-identical subset (_PII_CLASSES; parity-tested per "
    "pattern in tests/test_pii_scrub.py). Scale shape: ONE "
    "whole-stage-codegen projection — split, classify, and "
    "prefix-sum all run inside a single higher-order aggregate() "
    "per row; no explode, no window, no exchange (plan-asserted "
    "zero Exchange) — at 100 TB PII scrubbing is embarrassingly "
    "parallel and this plan keeps it that way.",
    tags=("text", "quality", "scale"),
)
def op_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level PII scrub: per customer contact line, emit the span
    list 'tok_idx:start-end:type' (1-based inclusive char offsets),
    the span count, and the scrubbed line."""
    c = load(spark, sf_dir, "customer")
    line = F.expr(_PII_LINE_SQL)
    toks = F.split(line, " ")
    # accumulator: (pos = next token's 1-based char offset,
    #               idx = tokens consumed,
    #               spans = 'idx:start-end:type' per PII token,
    #               scrub = every token, PII replaced by '<TYPE>')
    init = F.struct(
        F.lit(1).alias("pos"),
        F.lit(0).alias("idx"),
        F.expr("CAST(array() AS array<string>)").alias("spans"),
        F.expr("CAST(array() AS array<string>)").alias("scrub"),
    )

    def step(acc, x):
        typ = _pii_classify(x)
        idx = acc["idx"] + 1
        span = F.concat_ws(
            "",
            idx.cast("string"),
            F.lit(":"),
            acc["pos"].cast("string"),
            F.lit("-"),
            (acc["pos"] + F.length(x) - 1).cast("string"),
            F.lit(":"),
            typ,
        )
        return F.struct(
            (acc["pos"] + F.length(x) + 1).alias("pos"),
            idx.alias("idx"),
            F.when(typ.isNotNull(), F.concat(acc["spans"], F.array(span)))
            .otherwise(acc["spans"])
            .alias("spans"),
            F.concat(
                acc["scrub"],
                F.array(
                    F.when(
                        typ.isNotNull(),
                        F.concat(F.lit("<"), F.upper(typ), F.lit(">")),
                    ).otherwise(x)
                ),
            ).alias("scrub"),
        )

    done = F.aggregate(
        toks,
        init,
        step,
        lambda acc: F.struct(
            F.size(acc["spans"]).cast("bigint").alias("n_spans"),
            F.array_join(acc["spans"], ";").alias("spans"),
            F.array_join(acc["scrub"], " ").alias("scrubbed"),
        ),
    )
    return c.select(
        "c_custkey",
        done["n_spans"].alias("n_spans"),
        done["spans"].alias("spans"),
        done["scrubbed"].alias("scrubbed"),
    )
