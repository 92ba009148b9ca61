"""Text analysis — SURVEY.md §2.I (EXT: language-ID, quality scoring,
token counting, fingerprinting over ``documents``).

Everything is built-in string/regex/array functions — codegen'd JVM
expressions, a pure map stage with no shuffle until the final rollup.
At 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..plans.hints import hint_broadcast
from ..registry import query
from .textprep import tokens

#: BPE-ish word/number/punctuation tokenizer (RE2- and Java-regex
#: compatible: no lookarounds).
_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

_STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def _stop_hits_sql(lang: str) -> str:
    alt = "|".join(_STOPWORDS[lang])
    return rf"len(regexp_extract_all(lower(text), '\b({alt})\b'))"


def _stop_hits(lang: str):
    alt = "|".join(_STOPWORDS[lang])
    return F.size(F.regexp_extract_all(F.lower("text"), F.lit(rf"\b({alt})\b"), F.lit(0)))


@query(
    "op_text_stats",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars,
               CAST(SUM(CAST(length(text) AS BIGINT)) AS DOUBLE) / COUNT(*)
                   AS avg_chars,
               CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                                        x -> x <> ''))) AS BIGINT) AS total_tokens
        FROM documents
        GROUP BY lang
    """,
    tags=("text",),
)
def op_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (doc/char/token counts — all integer
    arithmetic, exact on both engines)."""
    d = load(spark, sf_dir, "documents")
    chars = F.length("text").cast("bigint")
    ntok = F.size(tokens(F.col("text"))).cast("bigint")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(chars).alias("total_chars"),
        (F.sum(chars).cast("double") / F.count("*")).alias("avg_chars"),
        F.sum(ntok).alias("total_tokens"),
    )


@query(
    "op_token_count",
    oracle=f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT)
                   AS n_tokens,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    x -> x <> '')) AS BIGINT) AS n_ws_tokens
        FROM documents
    """,
    tags=("text",),
)
def op_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: a BPE-ish regex tokenizer (letters /
    digits / single punctuation) and plain whitespace splitting."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_tokens"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_ws_tokens"),
    )


@query(
    "op_text_quality",
    oracle=r"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
                   / length(text) AS punct_ratio,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                   / length(text) AS digit_ratio,
               CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b'))
                    AS DOUBLE)
                   / len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                   AS stopword_ratio,
               CAST(CASE WHEN length(text) BETWEEN 100 AND 2000
                         THEN 1.0 ELSE 0.5 END AS DOUBLE)
                   AS length_score
        FROM documents
    """,
    tags=("text",),
)
def op_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: punctuation/digit/stopword ratios
    and a length score — per-row double divisions of exact integers, so
    bit-identical across engines."""
    d = load(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("bigint")
    punct = F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), F.lit(0)))
    digits = F.size(F.regexp_extract_all("text", F.lit("[0-9]"), F.lit(0)))
    ntok = F.size(tokens(F.col("text")))
    return d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        (punct.cast("double") / F.length("text")).alias("punct_ratio"),
        (digits.cast("double") / F.length("text")).alias("digit_ratio"),
        (_stop_hits("en").cast("double") / ntok).alias("stopword_ratio"),
        F.when(F.length("text").between(100, 2000), 1.0)
        .otherwise(0.5)
        .alias("length_score"),
    )


@query(
    "op_lang_id",
    oracle=f"""
        WITH hits AS (
          SELECT doc_id, lang,
                 {_stop_hits_sql("en")} AS en_hits,
                 {_stop_hits_sql("de")} AS de_hits,
                 {_stop_hits_sql("fr")} AS fr_hits,
                 {_stop_hits_sql("es")} AS es_hits
          FROM documents
        )
        SELECT doc_id, lang,
               CASE
                 WHEN en_hits >= de_hits AND en_hits >= fr_hits
                      AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
                 WHEN de_hits >= fr_hits AND de_hits >= es_hits
                      AND de_hits > 0 THEN 'de'
                 WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
                 WHEN es_hits > 0 THEN 'es'
                 ELSE 'unknown'
               END AS guessed_lang
        FROM hits
    """,
    notes="Stopword-vote language ID; the fixed precedence order (en > "
    "de > fr > es on ties) is encoded identically on both sides.",
    tags=("text",),
)
def op_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID by stopword voting — the classic n-gram/
    stopword classifier as a single codegen'd CASE expression."""
    d = load(spark, sf_dir, "documents")
    en, de = _stop_hits("en"), _stop_hits("de")
    fr, es = _stop_hits("fr"), _stop_hits("es")
    hits = d.select(
        "doc_id", "lang",
        en.alias("en_hits"), de.alias("de_hits"),
        fr.alias("fr_hits"), es.alias("es_hits"),
    )
    c = F
    guessed = (
        c.when(
            (c.col("en_hits") >= c.col("de_hits"))
            & (c.col("en_hits") >= c.col("fr_hits"))
            & (c.col("en_hits") >= c.col("es_hits"))
            & (c.col("en_hits") > 0),
            "en",
        )
        .when(
            (c.col("de_hits") >= c.col("fr_hits"))
            & (c.col("de_hits") >= c.col("es_hits"))
            & (c.col("de_hits") > 0),
            "de",
        )
        .when((c.col("fr_hits") >= c.col("es_hits")) & (c.col("fr_hits") > 0), "fr")
        .when(c.col("es_hits") > 0, "es")
        .otherwise("unknown")
    )
    return hits.select("doc_id", "lang", guessed.alias("guessed_lang"))


@query(
    "op_doc_fingerprint",
    oracle="""
        SELECT doc_id,
               sha256(COALESCE(array_to_string(
                 list_slice(list_filter(string_split(lower(text), ' '),
                                        x -> x <> ''), 1, 32), ' '), ''))
                 AS fingerprint
        FROM documents
    """,
    notes="Prefix fingerprint: sha256 of the first 32 normalized "
    "tokens — catches near-dups that share openings; the rolling-hash "
    "winnowing variant is op_doc_winnow (rows-only, pandas UDF).",
    tags=("text",),
)
def op_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint over the normalized token
    prefix."""
    d = load(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 32))
    return d.select("doc_id", F.sha2(prefix, 256).alias("fingerprint"))


@query(
    "op_doc_winnow",
    oracle=r"""
        WITH norm AS (
          SELECT doc_id,
                 array_to_string(
                   list_filter(regexp_split_to_array(lower(text),
                       '[\t-\r\x{1c}-\x{20}\x{85}\x{a0}\x{1680}' ||
                       '\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}' ||
                       '\x{205f}\x{3000}]+'),
                               x -> x <> ''), ' ') AS t
          FROM documents
        ),
        grams AS (
          SELECT doc_id, u.i AS pos,
                 unicode(t[u.i])     * CAST(923521 AS BIGINT)
               + unicode(t[u.i + 1]) * 29791
               + unicode(t[u.i + 2]) * 961
               + unicode(t[u.i + 3]) * 31
               + unicode(t[u.i + 4]) AS h
          FROM norm,
               LATERAL (SELECT unnest(generate_series(1, len(t) - 4)) AS i) u
        ),
        counts AS (
          SELECT doc_id, COUNT(*) AS nh FROM grams GROUP BY doc_id
        ),
        wins AS (
          SELECT doc_id, pos,
                 MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m
          FROM grams
        )
        SELECT doc_id, CAST(fingerprint AS BIGINT) AS fingerprint FROM (
          SELECT DISTINCT w.doc_id, w.m AS fingerprint
          FROM wins w JOIN counts c USING (doc_id)
          WHERE c.nh >= 8 AND w.pos <= c.nh - 7
          UNION
          SELECT g.doc_id, MIN(g.h) AS fingerprint
          FROM grams g JOIN counts c USING (doc_id)
          WHERE c.nh < 8 GROUP BY g.doc_id
        )
    """,
    notes="Winnowing fingerprints (Schleimer et al., SIGMOD'03): "
    "rolling 5-gram character hashes, minimum per 8-hash window. "
    "Imperative inner loop ⇒ Arrow-batched mapInPandas (the sanctioned "
    "slow path). FULLY ORACLE-CHECKED as of r13 (was rows-only) — even "
    "the Arrow escape hatch gets cross-engine verification: a 5-gram's "
    "base-31 polynomial value is at most max_codepoint*31^4 ≈ 1e12, "
    "far below the 2^61-1 modulus, so the Python loop's rolling mod is "
    "arithmetic-exact no-op and DuckDB recomputes each gram hash "
    "DIRECTLY as int64 (unicode(ch) == ord(ch) per code point); "
    "per-window minima via MIN OVER 8-row frames, short-doc (<8 "
    "grams) min-of-all branch included. Normalization: the SQL split "
    "class enumerates EXACTLY Python str.split()'s whitespace set "
    "(str.isspace: \\t-\\r, \\x1c-\\x20, \\x85, \\xa0, U+1680, "
    "U+2000-200A, U+2028/2029/202F/205F/3000 — RE2 \\s is ASCII-only "
    "and misses NBSP etc., r14 ADVICE fix; class equality vs "
    "isspace() asserted over the full BMP in tests).",
    tags=("text", "udf"),
)
def op_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints via mapInPandas — demonstrates
    the engine's Arrow-batched Python escape hatch with a real
    algorithm Spark expressions can't express cleanly."""
    import pandas as pd

    par = spark.sparkContext.defaultParallelism
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(par, "doc_id")
    )

    K, W, MOD = 5, 8, (1 << 61) - 1

    def winnow(batches):
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # null-safe: a NULL text must not kill the whole task
                t = " ".join((text or "").lower().split())
                hashes = []
                h, power = 0, pow(31, K - 1, MOD)
                for i, ch in enumerate(t):
                    h = (h * 31 + ord(ch)) % MOD
                    if i >= K:
                        h = (h - ord(t[i - K]) * power * 31) % MOD
                    if i >= K - 1:
                        hashes.append(h)
                fps = set()
                if 0 < len(hashes) < W:
                    # standard winnowing: a doc shorter than one
                    # window still emits min(hashes) — it used to
                    # silently vanish from the output (review finding)
                    fps.add(min(hashes))
                for i in range(max(0, len(hashes) - W + 1)):
                    fps.add(min(hashes[i : i + W]))
                for fp in sorted(fps):
                    out.append((int(doc_id), fp))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(
                        [r[0] for r in out], dtype="int64"
                    ),
                    "fingerprint": pd.Series(
                        [r[1] for r in out], dtype="int64"
                    ),
                }
            )

    return d.mapInPandas(winnow, "doc_id long, fingerprint long").orderBy(
        "doc_id", "fingerprint"
    )


@query(
    "op_token_topk",
    oracle="""
        SELECT tok, n FROM (
          SELECT u.tok AS tok, COUNT(*) AS n,
                 ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, u.tok) AS rn
          FROM documents,
               LATERAL unnest(list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')) AS u(tok)
          GROUP BY u.tok
        ) WHERE rn <= 20
    """,
    notes="Corpus vocabulary head: explode tokens → count → top-20 "
    "with lexicographic tiebreak. At 100 TB this is the canonical "
    "two-phase count (map-side partial per token) + TakeOrdered.",
    tags=("text",),
)
def op_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent tokens across the corpus."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@query(
    "op_quality_filter",
    oracle=r"""
        SELECT doc_id, lang, n_chars
        FROM (
          SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
                     / length(text) AS punct_ratio,
                 len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                     AS n_tokens
          FROM documents
        )
        WHERE n_chars >= 100
          AND punct_ratio < 0.1
          AND n_tokens >= 20
    """,
    notes="The filtering pipeline composed from the quality signals: "
    "length / punctuation / token-count gates — the op that actually "
    "decides what enters a training set.",
    tags=("text",),
)
def op_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data quality gate: keep documents passing all signal
    thresholds. Pure scan-side filtering — at 100 TB this runs at I/O
    speed and shrinks everything downstream."""
    d = load(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("bigint")
    punct = F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), F.lit(0)))
    ntok = F.size(tokens(F.col("text")))
    return (
        d.select(
            "doc_id",
            "lang",
            n_chars.alias("n_chars"),
            (punct.cast("double") / F.length("text")).alias("punct_ratio"),
            ntok.alias("n_tokens"),
        )
        .filter(
            (F.col("n_chars") >= 100)
            & (F.col("punct_ratio") < 0.1)
            & (F.col("n_tokens") >= 20)
        )
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "op_dataset_split",
    oracle="""
        SELECT doc_id,
               CASE
                 WHEN bucket < 8 THEN 'train'
                 WHEN bucket = 8 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                                      1, 8)) AS BIGINT) % 10 AS bucket
          FROM documents
        )
    """,
    notes="Deterministic content-hash dataset split (80/10/10): the "
    "assignment depends only on (doc_id, content) — stable across "
    "runs, machines, and engines (md5 is md5 everywhere), immune to "
    "row order and partitioning. The reproducible-split primitive "
    "every training pipeline needs; rand()-based splits are none of "
    "these things.",
    tags=("text",),
)
def op_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment by content hash."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    return d.select(
        "doc_id",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "op_collocations",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
          FROM documents
        ),
        uni AS (
          SELECT u.tok, COUNT(*) AS n
          FROM toks, LATERAL unnest(t) AS u(tok)
          GROUP BY u.tok
        ),
        tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS n_tokens FROM uni),
        bi AS (
          SELECT t[u.i] AS w1, t[u.i + 1] AS w2, COUNT(*) AS n_ab
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) u
          GROUP BY 1, 2
        )
        SELECT b.w1, b.w2, b.n_ab,
               (CAST(b.n_ab AS DOUBLE) * t.n_tokens)
                   / (CAST(a1.n AS DOUBLE) * a2.n) AS pmi_ratio
        FROM bi b
        JOIN uni a1 ON b.w1 = a1.tok
        JOIN uni a2 ON b.w2 = a2.tok
        CROSS JOIN tot t
        WHERE b.n_ab >= 20
    """,
    notes="Collocation strength as the PMI ratio p(ab)/(p(a)p(b)) — "
    "kept as a ratio of exact integer counts (one double expression, "
    "identical on both engines) instead of log-PMI, whose libm last "
    "ulp differs across engines.",
    tags=("text",),
)
def op_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocations: which word pairs co-occur far more than
    their unigram frequencies predict. Counts shuffle as (token, n)
    pairs — corpus-size-independent state per key."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    idx = F.sequence(F.lit(1), F.size("t") - 1)
    # Guarded for 1-token docs: sequence(1, 0) would DESCEND in Spark
    # (step -1) and element_at(t, 0) throws under ANSI, while DuckDB's
    # generate_series(1, 0) is empty. CASE WHEN evaluates per-row;
    # the un-matched branch yields NULL, which explode drops — exactly
    # the oracle's empty-series behavior.
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(F.col("t"), i).alias("w1"),
                F.element_at(F.col("t"), i + 1).alias("w2"),
            ),
        ),
    )
    bi = (
        toks.select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    total = uni.agg(F.sum("n").cast("double").alias("n_tokens"))
    a1 = uni.select(F.col("tok").alias("w1"), F.col("n").alias("n_a"))
    a2 = uni.select(F.col("tok").alias("w2"), F.col("n").alias("n_b"))
    return (
        bi.join(a1, "w1")
        .join(a2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_ab",
            (
                (F.col("n_ab").cast("double") * F.col("n_tokens"))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("pmi_ratio"),
        )
    )


@query(
    "op_vocab_encode",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
          FROM documents
        ),
        vocab AS (
          SELECT u.tok,
                 CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, u.tok) - 1
                      AS BIGINT) AS token_id
          FROM toks, LATERAL unnest(t) AS u(tok)
          GROUP BY u.tok
        )
        SELECT s.doc_id, CAST(s.pos AS INT) AS pos, v.token_id
        FROM (
          SELECT doc_id, u.i AS pos, t[u.i] AS tok
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, least(len(t), 16))) AS i) u
        ) s
        JOIN vocab v ON s.tok = v.tok
        WHERE s.doc_id < 50
    """,
    notes="Tokenizer-to-ids: vocabulary built by frequency rank "
    "(deterministic tiebreak), then documents encoded to (pos, "
    "token_id) rows — the preprocessing step before any training "
    "batch is packed. Truncated to 16 positions / 50 docs to keep the "
    "gate output bounded; the pipeline itself is unbounded.",
    tags=("text",),
)
def op_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary + positional token-id encoding.
    The vocab is corpus-derived (Heaps'-law growth), so it carries NO
    static broadcast hint — stats/AQE broadcast it at fixture scale
    and fall to a shuffle join when the vocabulary is genuinely large;
    the probe side here is 50 docs x 16 positions either way.

    The frequency rank itself uses the op_surrogate_key bucket-offset
    technique rather than a global ROW_NUMBER (whose empty PARTITION
    BY collapses the whole vocabulary onto one task): 15 composite
    (n, tok) cutpoints from a seeded 1% sample split the total order
    (n DESC, tok ASC) into 16 range buckets — composite cuts, because
    Zipfian counts make n alone degenerate (half the vocab ties at
    n=1 and would land in one bucket); per-bucket counts prefix-sum
    on the driver (≤16 scalars, metadata); token_id = within-bucket
    ROW_NUMBER + bucket offset − 1. Bit-identical to the global rank
    because buckets respect the total order and (n, tok) is unique
    per row.

    The bucket machinery costs exactly TWO metadata actions beyond the
    eager checkpoint (r12 shipped three — the r12-verdict latency
    item): the 1% sample collects in one pass and yields both its size
    and the 15 rank cutpoints via a driver-side sort (Python's
    code-point string order is UTF-8 binary order, i.e. Spark's
    default UTF8_BINARY collation, so the tiebreak is identical to the
    former single-task row_number window this replaces); the bucket
    counts are the second action. The sample is 1% of the VOCABULARY
    (Heaps'-law ≪ corpus) — the same boundary-metadata trade
    op_surrogate_key documents for its percentile sample."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens(F.col("text")).alias("t"))
    # materialize the counts ONCE: the bucket machinery below takes
    # two metadata actions (sample collect, bucket counts) plus the
    # final plan, and without a checkpoint each one re-runs
    # tokenize+explode+groupBy over the corpus (measured 1.6->5.7 s at
    # sf1). The checkpointed table is vocabulary-sized (Heaps'-law ≪
    # corpus), the standard multi-pass trade this repo's localCheckpoint
    # ops already make. Failure mode at cluster scale (r12 advice):
    # localCheckpoint truncates lineage into UNREPLICATED executor-local
    # blocks, so losing an executor mid-query fails the op instead of
    # recomputing; a cluster deployment that can't simply re-run should
    # swap in reliable checkpoint() (needs spark.checkpoint.dir) or
    # persist(StorageLevel.MEMORY_AND_DISK_2).
    # EAGER, deliberately: eager=False looks like it would merge the
    # materialization into the sample collect's job, but measured warm
    # sf0.1 it RECOMPUTES the corpus aggregation per downstream action
    # (1.5 s → 5.7 s) — the lazy local checkpoint doesn't reliably pin
    # blocks from a partial-output action like sample().collect().
    vocab_counts = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    order = (F.col("n").desc(), F.col("tok").asc())
    # Driver memory note (r13 advice): this collects the whole 1%
    # vocabulary sample — linear in |vocab| (not corpus). At a
    # 100 TB-scale vocabulary where even 1% of Heaps-bounded vocab
    # strains the driver, derive the 15 cutpoints with an
    # approxQuantile-style distributed selection instead of
    # collecting; here the sample is a few thousand (n, tok) rows.
    sample_rows = (
        vocab_counts.sample(fraction=0.01, seed=42)
        .select("n", "tok")
        .collect()
    )
    if not sample_rows:  # tiny or empty vocab: sample everything
        sample_rows = vocab_counts.select("n", "tok").collect()
    n_sample = len(sample_rows)
    step = max(1, n_sample // 16)
    ranked = sorted(sample_rows, key=lambda r: (-r["n"], r["tok"]))
    cuts = sorted(
        (ranked[rn - 1]["n"], ranked[rn - 1]["tok"])
        for rn in range(step, min(step * 16, n_sample + 1), step)
    )
    # pid = how many cutpoints this row sorts AFTER under
    # (n DESC, tok ASC) — rows sharing a bucket are contiguous in the
    # total order, so offset + within-bucket rank is the global rank
    pid = sum(
        (
            (
                (F.col("n") < F.lit(cn))
                | ((F.col("n") == F.lit(cn)) & (F.col("tok") > F.lit(ct)))
            ).cast("int")
            for cn, ct in cuts
        ),
        F.lit(0),
    )
    with_pid = vocab_counts.select("tok", "n", pid.alias("pid"))
    bucket_counts = {
        r["pid"]: r["cnt"]
        for r in with_pid.groupBy("pid")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(bucket_counts):
        offsets[b] = acc
        acc += bucket_counts[b]
    offset_col = (
        F.coalesce(
            *[
                F.when(F.col("pid") == b, F.lit(off))
                for b, off in offsets.items()
            ]
        )
        if offsets
        else F.lit(0)
    )
    w_bucket = W.partitionBy("pid").orderBy(*order)
    vocab = with_pid.select(
        "tok",
        (
            F.row_number().over(w_bucket) + offset_col.cast("bigint") - 1
        ).cast("bigint").alias("token_id"),
    )
    prefix = toks.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.posexplode(F.slice("t", 1, 16)).alias("pos0", "tok"),
    )
    return (
        prefix.join(hint_broadcast(vocab), "tok")
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("int").alias("pos"),
            "token_id",
        )
    )


@query(
    "op_pack_sequences",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        run AS (
          SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM toks
        )
        SELECT doc_id, n_tokens,
               CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT)
                   AS bin_id,
               CAST(cum - n_tokens AS BIGINT)
                   - CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 2048) AS BIGINT)
                     * 2048 AS bin_offset
        FROM run
    """,
    notes="Contiguous sequence packing: documents stream in doc_id "
    "order into 2048-token bins, each doc's bin and offset derived "
    "from the exclusive running token count — all integer window "
    "arithmetic, so both engines agree exactly. The packing that "
    "turns a ragged corpus into fixed-length training sequences. The "
    "running sum runs over 16 deterministic doc_id range buckets with "
    "driver prefix-summed offsets (the op_surrogate_key technique) — "
    "never a single-partition global window, and never the text.",
    tags=("text",),
)
def op_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document a training-bin id + offset by contiguous
    greedy packing over the deterministic doc order.

    The running token count uses the op_surrogate_key bucket-offset
    technique instead of a global ORDER BY window (whose empty
    PARTITION BY plans Exchange SinglePartition — every (doc_id,
    n_tokens) pair on one task): 15 doc_id cutpoints from a seeded 1%
    sample split the order into 16 range buckets; per-bucket token
    SUMS prefix-sum on the driver (≤16 scalars); each row's running
    count = within-bucket running sum + its bucket's token offset.
    Bit-identical to the global window because doc_id is unique and
    buckets respect its total order."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    # materialize (doc_id, n_tokens) ONCE — 16 bytes/doc, never the
    # text — so the sample percentile, the bucket sums and the final
    # plan don't each re-tokenize the corpus (the same multi-pass
    # trade as op_vocab_encode's checkpoint; measured at sf1; same
    # executor-loss caveat — see the note there re: reliable
    # checkpoint()/MEMORY_AND_DISK_2 for cluster deployments)
    toks = d.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    ).localCheckpoint(eager=True)
    fracs = [i / 16 for i in range(1, 16)]
    # ONE metadata action in the common path (the r12-verdict latency
    # item): percentile over an EMPTY sample is NULL, so the empty
    # probe doubles as the result — the former isEmpty() pre-check
    # paid a whole extra job just to decide which frame to aggregate.
    pctl = F.expr(
        f"percentile(doc_id, array({','.join(map(str, fracs))}))"
    ).alias("c")
    cuts = toks.sample(fraction=0.01, seed=42).agg(pctl).first()["c"]
    if cuts is None:  # tiny/empty sample: percentile the full table
        cuts = toks.agg(pctl).first()["c"]
    if cuts is None:  # empty corpus: percentile is NULL, one bucket
        cuts = []
    pid = sum(
        ((F.col("doc_id") > F.lit(float(c))).cast("int") for c in cuts),
        F.lit(0),
    ).alias("pid")
    with_pid = toks.select("doc_id", "n_tokens", pid)
    bucket_sums = {
        r["pid"]: r["tot"]
        for r in with_pid.groupBy("pid")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(bucket_sums):
        offsets[b] = acc
        acc += bucket_sums[b] or 0
    offset_col = (
        F.coalesce(
            *[
                F.when(F.col("pid") == b, F.lit(off))
                for b, off in offsets.items()
            ]
        )
        if offsets
        else F.lit(0)
    )
    w = (
        W.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = with_pid.withColumn(
        "cum", F.sum("n_tokens").over(w) + offset_col.cast("bigint")
    )
    start = F.col("cum") - F.col("n_tokens")
    bin_id = F.floor(start.cast("double") / 2048).cast("bigint")
    return run.select(
        "doc_id",
        "n_tokens",
        bin_id.alias("bin_id"),
        (start - bin_id * 2048).alias("bin_offset"),
    )


@query(
    "op_text_repetition",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
          FROM documents
        ),
        grams AS (
          SELECT doc_id, len(t) AS n_tokens,
                 CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, len(t)),
                             i -> t[i] || ' ' || t[i+1])
                 END AS bg,
                 CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1),
                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                 END AS tg
          FROM toks
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(list_max(list_transform(list_distinct(bg),
                        d -> len(list_filter(bg, x -> x = d)))) AS DOUBLE)
                   / len(bg) AS top_bigram_frac,
               CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
                   AS dup_bigram_frac,
               CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg)
                   AS dup_trigram_frac
        FROM grams
    """,
    notes="Gopher-style repetition signals, adapted to token level "
    "(fixture docs are single-line, so line-level fractions would be "
    "degenerate): the fraction of all bigrams taken by the most "
    "frequent bigram, and the duplicate-bigram/trigram fractions. "
    "Exact integer counts, one double division per column — "
    "hash-matched. Docs too short for an n-gram get NULL (both "
    "engines).",
    tags=("text",),
)
def op_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals: heavily repeated n-grams are
    the classic marker of boilerplate/spam/keyword-stuffing in
    training-data filtering. Per-row array work only — a pure map
    stage at scan speed; the per-doc cost is O(distinct_bigrams ·
    bigrams), bounded by document length, not corpus size."""
    d = load(spark, sf_dir, "documents")

    def grams(col, k):
        idx = F.sequence(F.lit(1), F.size(col) - (k - 1))
        return F.when(
            F.size(col) >= k,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(col, i + j) for j in range(k)]
                ),
            ),
        )

    # Materialize tokens as a COLUMN before the per-element gram
    # references: pasting the tokens(...) expression into grams()
    # re-tokenized the document per element — the O(tokens²) hazard
    # textprep.let documents (CollapseProject never inlines a
    # non-cheap producer referenced more than once, so the two-step
    # select is a real evaluation barrier).
    df = d.select("doc_id", tokens(F.col("text")).alias("t")).select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        grams(F.col("t"), 2).alias("bg"),
        grams(F.col("t"), 3).alias("tg"),
    )
    bg, tg = F.col("bg"), F.col("tg")
    top_bg = F.array_max(
        F.transform(
            F.array_distinct(bg),
            lambda d_: F.size(F.filter(bg, lambda x: x == d_)),
        )
    )
    return df.select(
        "doc_id",
        "n_tokens",
        (top_bg.cast("double") / F.size(bg)).alias("top_bigram_frac"),
        (
            (F.size(bg) - F.size(F.array_distinct(bg))).cast("double")
            / F.size(bg)
        ).alias("dup_bigram_frac"),
        (
            (F.size(tg) - F.size(F.array_distinct(tg))).cast("double")
            / F.size(tg)
        ).alias("dup_trigram_frac"),
    )


#: PII patterns — Java-regex and RE2 compatible (no lookarounds)
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9 ()\-]{7,}[0-9]"


@query(
    "op_pii_redact",
    oracle=f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(
                        regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}')) AS BIGINT) AS n_phones,
               regexp_replace(
                   regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM documents
    """,
    notes="PII scrubbing — the redaction pass every public training "
    "corpus runs. Emails first, then phone-like digit runs on the "
    "already-email-redacted text (so a phone inside an email is not "
    "double-counted); counts + redacted text hash-matched. Patterns "
    "are RE2/Java-compatible so both engines execute the same regex.",
    tags=("text",),
)
def op_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction with match counts. Pure regexp_replace /
    regexp_count — codegen'd, scan-speed, no shuffle; at 100 TB this is
    a map-only rewrite of the corpus."""
    d = load(spark, sf_dir, "documents")
    after_email = F.regexp_replace("text", _EMAIL_RE, "<EMAIL>")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(after_email, F.lit(_PHONE_RE))
        .cast("bigint")
        .alias("n_phones"),
        F.regexp_replace(after_email, _PHONE_RE, "<PHONE>").alias("redacted"),
    )


@query(
    "op_tfidf_topterms",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
          FROM documents
        ),
        tf AS (
          SELECT doc_id, unnest(t) AS term FROM toks
        ),
        tfc AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM tf GROUP BY doc_id, term
        ),
        df AS (
          SELECT term, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT c.doc_id, c.term,
                 CAST(c.tf AS BIGINT) AS tf,
                 CAST(d.df AS BIGINT) AS df,
                 CAST(c.tf * n.n_docs AS DOUBLE) / d.df AS score,
                 ROW_NUMBER() OVER (
                   PARTITION BY c.doc_id
                   ORDER BY CAST(c.tf * n.n_docs AS DOUBLE) / d.df DESC,
                            c.term ASC
                 ) AS rk
          FROM tfc c JOIN df d ON c.term = d.term CROSS JOIN n
          WHERE c.doc_id < 100
        )
        SELECT doc_id, term, tf, df, score
        FROM scored WHERE rk <= 3
    """,
    notes="TF-IDF-style term salience (rational form tf*N/df — no "
    "log, so the score is one exact integer product and one double "
    "division, bit-identical across engines), top-3 terms per doc "
    "with a total-order tiebreak. Restricted to doc_id < 100 to "
    "bound gate output; the pipeline is unbounded.",
    tags=("text",),
)
def op_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most distinctive terms per document by tf·N/df.

    Scale posture: tf is a map-side-combinable count over
    (doc_id, term); df is a second aggregate over terms — vocabulary ≪
    corpus but still corpus-derived (Heaps'-law growth), so it carries
    no static broadcast hint: stats/AQE broadcast it at fixture scale
    and shuffle-join it against the tiny 100-doc probe when the
    vocabulary is genuinely large. Top-3 per doc runs as a
    WindowGroupLimit below the exchange, so ≤3 rows per doc leave
    each task."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    n_docs = d.count()  # driver-side scalar: one count, reused as a literal
    tf = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    score = (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df")
    w = W.partitionBy("doc_id").orderBy(
        score.desc(), F.col("term").asc()
    )
    return (
        tf.filter(F.col("doc_id") < 100)
        .join(hint_broadcast(df), "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            score.alias("score"),
        )
    )


@query(
    "op_heavy_hitters",
    oracle="""
        SELECT tok, n FROM (
          SELECT u.tok AS tok, COUNT(*) AS n,
                 ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, u.tok) AS rn
          FROM documents,
               LATERAL unnest(list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')) AS u(tok)
          GROUP BY u.tok
        ) WHERE rn <= 10
    """,
    notes="Heavy hitters via two-pass candidate generation + exact "
    "recount — the shape that beats op_token_topk's full token shuffle "
    "when vocabulary is huge: pass 1 keeps a per-input-partition "
    "Counter (Arrow-batched, zero shuffle) and emits only each "
    "partition's local top-64; pass 2 broadcast-semi-joins the tiny "
    "candidate set back and recounts exactly, so only candidate "
    "tokens ever shuffle. NOT unconditionally exact: a true top-10 "
    "token is missed only if it falls below the local top-64 cut in "
    "EVERY one of the P input partitions, which bounds its global "
    "count by P x (the 64th-highest local count) — so exactness "
    "holds whenever the k-th global count exceeds that bound, as it "
    "does for Zipfian text whose head tokens dominate every split "
    "(asserted vs the exact oracle at every fixture scale). For "
    "adversarially flat distributions, raise local_m or fall back "
    "to op_token_topk's full shuffle.",
    tags=("text", "scale"),
)
def op_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 corpus tokens without shuffling the full vocabulary."""
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))

    local_m = 64

    # Measured rejection (round 3): pre-aggregating (tok, count) per
    # document with JVM HOFs (array_distinct + a filter-count per
    # distinct token) shrinks the Arrow transfer ~10x but costs
    # O(distinct x n) string comparisons per doc — 15.3 s vs 6.3 s at
    # the 50k-doc sf1 fixture. Shipping raw tokens and counting with
    # pandas value_counts (vectorized C) wins; at real scale the
    # Arrow volume is the map stage's linear cost either way.
    def local_top(batches):
        from collections import Counter

        c: Counter = Counter()
        for pdf in batches:
            c.update(pdf["tok"].value_counts().to_dict())
        if c:
            head = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:local_m]
            yield pd.DataFrame({"tok": [t for t, _ in head]})

    cand = toks.mapInPandas(local_top, "tok string").distinct()
    exact = (
        toks.join(F.broadcast(cand), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    return exact.orderBy(F.desc("n"), "tok").limit(10)


#: BM25 constants and the fixed demo query — module-level so the
#: pytest reference implementation scores with the identical inputs.
BM25_K1, BM25_B = 1.2, 0.75
BM25_QUERY_TERMS = ("data", "model", "training")


@query(
    "op_bm25",
    oracle="""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(
                   string_split(lower(text), ' '), x -> x <> '')) AS tok
          FROM documents
        ),
        dl AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS BIGINT) AS dl
          FROM documents
        ),
        stats AS (
          SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                 (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl)
                   AS avgdl
        ),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf
          FROM toks WHERE tok IN ('data', 'model', 'training')
          GROUP BY doc_id, tok
        ),
        dfreq AS (
          SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
        ),
        terms AS (
          SELECT tf.doc_id,
                 CAST(FLOOR(
                   ln((stats.n_docs - dfreq.df + 0.5)
                      / (dfreq.df + 0.5) + 1.0)
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / stats.avgdl)))
                   * 1000000 + 0.5) AS BIGINT) AS term_q
          FROM tf
          JOIN dfreq USING (tok)
          JOIN dl USING (doc_id), stats
        )
        SELECT doc_id,
               CAST(SUM(term_q) AS DOUBLE) / 1000000.0 AS score
        FROM terms GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT 20
    """,
    notes="BM25 retrieval scoring over the corpus for a fixed query. "
    "FULLY ORACLE-CHECKED as of r14 (was rows-only): every input "
    "frequency (tf, df, doc length, avgdl) is an exact integer "
    "aggregate, avgdl is one identical double division of identical "
    "exact integers on both engines, and each per-term score is "
    "quantized through the repo's fixed-point convention "
    "(FLOOR(x*1e6+0.5), exprs.py) BEFORE the per-document sum, so the "
    "sum is exact integer arithmetic and the only cross-engine "
    "divergence left is ln()'s last-ulp rounding — ~1e-16 relative, "
    "which the 1e-6 quantization grid absorbs with ~1e-9 boundary "
    "probability per row. The Spark and SQL expressions apply the "
    "same IEEE ops in the same order (constants 2.2/1.2/0.25/0.75 "
    "spelled as the Python-folded literals). Plan shape: one token "
    "explode filtered to query terms (scan-stage map), tiny df "
    "aggregate + 1-row avgdl broadcast back, dl semi-join-restricted "
    "to matching docs before its shuffle join, top-20 via "
    "TakeOrdered. tests/test_quality.py additionally recomputes every "
    "returned score in pure Python.",
    tags=("text", "similarity"),
)
def op_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 score for the fixed query terms."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dl = d.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("dl")
    )
    n_docs = d.count()
    avgdl_df = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl")
    )

    qterms = toks.filter(F.col("tok").isin(*BM25_QUERY_TERMS))
    tf = qterms.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_ = qterms.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
        + 1.0
    )
    # dl is corpus-cardinality — never broadcast it. Restrict it to
    # the (few) documents that matched a query term, then shuffle-join
    # on doc_id; only df_ (|terms| rows) and avgdl (1 row) broadcast.
    dl_matched = dl.join(tf.select("doc_id").distinct(), "doc_id", "left_semi")
    # Quantize PER TERM (before the sum): the per-document sum is then
    # exact integer arithmetic, order-independent on both engines —
    # the old sorted-struct deterministic fold is no longer needed.
    term_score = (
        idf
        * (F.col("tf").cast("double") * (BM25_K1 + 1.0))
        / (
            F.col("tf").cast("double")
            + BM25_K1
            * (
                1.0
                - BM25_B
                + BM25_B * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
    )
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .join(dl_matched, "doc_id")
        .crossJoin(F.broadcast(avgdl_df))
        .select(
            "doc_id",
            F.floor(term_score * 1000000.0 + F.lit(0.5))
            .cast("bigint")
            .alias("term_q"),
        )
        .groupBy("doc_id")
        .agg((F.sum("term_q").cast("double") / 1000000.0).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(20)


@query(
    "op_span_corruption",
    oracle="""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '')
                     AS toks
          FROM documents
        ),
        b AS (
          SELECT doc_id, toks,
                 range(0, CAST(FLOOR((len(toks) + 2) / 3) AS BIGINT)) AS blocks
          FROM t
        )
        SELECT doc_id,
               COALESCE(array_to_string(
                 list_transform(blocks, bi ->
                   CASE WHEN ((doc_id * 131 + bi) * 2654435761) % 17 = 0
                        THEN '<extra_id>'
                        ELSE array_to_string(
                               list_slice(toks, bi * 3 + 1, bi * 3 + 3), ' ')
                   END),
                 ' '), '') AS corrupted,
               COALESCE(array_to_string(
                 list_transform(
                   list_filter(blocks, bi ->
                     ((doc_id * 131 + bi) * 2654435761) % 17 = 0),
                   bi -> array_to_string(
                           list_slice(toks, bi * 3 + 1, bi * 3 + 3), ' ')),
                 ' '), '') AS target,
               CAST(len(list_filter(blocks, bi ->
                     ((doc_id * 131 + bi) * 2654435761) % 17 = 0))
                    AS INTEGER) AS n_masked
        FROM b
    """,
    notes="T5-style span corruption for denoising-objective training "
    "data: ~6% of 3-token blocks are masked to a sentinel, masked "
    "spans become the target sequence. The mask is PURE integer "
    "arithmetic on (doc_id, block) — no RNG, no engine hash "
    "function — so the whole transformation is expressible in both "
    "engines and hash-checked end-to-end (rare for an augmentation "
    "op). Zero shuffle: one scan, all higher-order functions.",
    tags=("text", "training"),
)
def op_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask deterministic token spans; emit (corrupted, target)."""
    d = load(spark, sf_dir, "documents")
    # tokens materialized as a column FIRST: nblocks pastes the token
    # expression twice inside blocks, which re-tokenized every doc 3×
    # (constant-factor cousin of the textprep.let O(tokens²) class).
    nblocks = F.floor((F.size("t") + 2) / 3).cast("bigint")
    # Guard the empty-document case: sequence(0, -1) would auto-step
    # DOWNWARD to [0, -1] (phantom blocks), while the oracle's
    # range(0, 0) is empty — an all-whitespace doc must yield no
    # blocks on both engines.
    blocks = F.when(
        nblocks > 0, F.sequence(F.lit(0).cast("bigint"), nblocks - 1)
    ).otherwise(F.array().cast("array<bigint>"))

    def masked(b):
        return ((F.col("doc_id") * 131 + b) * F.lit(2654435761)) % 17 == 0

    def block_text(t, b):
        return F.concat_ws(" ", F.slice(t, (b * 3 + 1).cast("int"), 3))

    with_toks = d.select(
        "doc_id", tokens(F.col("text")).alias("t")
    ).select("doc_id", "t", blocks.alias("bs"))
    return with_toks.select(
        "doc_id",
        F.array_join(
            F.transform(
                "bs",
                lambda b: F.when(masked(b), F.lit("<extra_id>")).otherwise(
                    block_text(F.col("t"), b)
                ),
            ),
            " ",
        ).alias("corrupted"),
        F.array_join(
            F.transform(
                F.filter("bs", masked), lambda b: block_text(F.col("t"), b)
            ),
            " ",
        ).alias("target"),
        F.size(F.filter("bs", masked)).alias("n_masked"),
    )


@query(
    "op_doc_rarity",
    oracle="""
        WITH pairs AS (
          SELECT doc_id, u.tok AS tok, COUNT(*) AS c
          FROM documents,
               LATERAL unnest(list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')) AS u(tok)
          GROUP BY doc_id, u.tok
        ),
        df AS (SELECT tok, COUNT(*) AS df FROM pairs GROUP BY tok)
        SELECT p.doc_id,
               CAST(SUM(p.c) AS BIGINT) AS n_tokens,
               CAST(SUM(p.c * df.df) AS BIGINT) AS df_sum,
               CAST(SUM(p.c * df.df) AS DOUBLE) / CAST(SUM(p.c) AS BIGINT)
                   AS avg_df
        FROM pairs p JOIN df USING (tok)
        GROUP BY p.doc_id
    """,
    notes="Unigram document-frequency scoring — the exact-arithmetic "
    "cousin of LM-perplexity quality filtering: a doc whose tokens "
    "have low average document frequency is rare/specialized (or "
    "noisy); high average means boilerplate. All-integer until one "
    "final division of identical operands, so the DOUBLE hash-matches "
    "across engines (the reason this is the oracle-able stand-in for "
    "log-prob scoring, whose ln() drifts by ulps — see op_bm25). "
    "Scale shape: tokens are pre-aggregated to (doc_id, tok, count) "
    "pairs, then df is attached as COUNT(*) OVER (PARTITION BY tok) — "
    "a window, not a self-join — so the corpus is tokenized and "
    "exploded exactly ONCE (the join formulation re-ran the explode "
    "pipeline for the df branch and measured 4.0x at 10x data; the "
    "window version is 1.6x, see PERF.md). The tok shuffle sees "
    "head-token skew; AQE handles it. No driver-side state; the "
    "vocabulary never collects.",
    tags=("text", "quality", "scale"),
)
def op_doc_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean token document-frequency (exact rational + one
    deterministic division)."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    pairs = d.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    with_df = pairs.withColumn(
        "df", F.count("*").over(W.partitionBy("tok"))
    )
    per_doc = with_df.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c") * F.col("df")).alias("df_sum"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "df_sum",
        (F.col("df_sum").cast("double") / F.col("n_tokens")).alias("avg_df"),
    )


@query(
    "op_doc_chunk",
    oracle="""
        WITH params AS (SELECT 500 AS sz, 400 AS stride),
        n AS (
          SELECT d.doc_id, d.text, d.n_chars,
                 CASE WHEN d.n_chars <= p.sz THEN 1
                      ELSE CAST((d.n_chars - p.sz + p.stride - 1)
                                // p.stride AS INT) + 1 END AS n_chunks
          FROM documents d, params p
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_id,
               CAST(length(substr(text, CAST(i AS INT) * 400 + 1, 500))
                    AS INT) AS chunk_len,
               md5(substr(text, CAST(i AS INT) * 400 + 1, 500))
                   AS chunk_md5
        FROM (
          SELECT doc_id, text,
                 unnest(generate_series(0, n_chunks - 1)) AS i
          FROM n
        )
    """,
    notes="RAG/training-style document chunking: fixed 500-char "
    "windows with 100-char overlap (stride 400), chunk count derived "
    "with INTEGER ceiling arithmetic so both engines enumerate "
    "identical windows, content verified per-chunk via md5 (identical "
    "digests ⇔ byte-identical substrings — substr is 1-based on both "
    "engines). Zero shuffle: sequence+explode is a scan-side "
    "projection, chunks inherit the document's partition; at 100 TB "
    "chunking is free compared to the embedding pass it feeds, and "
    "the overlap guarantees no boundary-spanning text is lost to "
    "retrieval.",
    tags=("text", "training"),
)
def op_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size character chunks per document."""
    sz, stride = 500, 400
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    # integer DIV on both sides: the old float-divide-then-cast pair
    # diverged (Spark's cast truncates, DuckDB's CAST-from-float
    # ROUNDS — a doc with n_chars=701 got 2 chunks here, 3 in the
    # oracle; review finding, fixture-masked)
    n_chunks = F.when(F.col("n_chars") <= sz, F.lit(1)).otherwise(
        F.expr(f"(n_chars - {sz} + {stride} - 1) div {stride}").cast("int")
        + 1
    )
    chunks = d.withColumn(
        "chunk_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)),
    )
    piece = F.substring(
        F.col("text"), F.col("chunk_id") * stride + 1, sz
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.length(piece).cast("int").alias("chunk_len"),
        F.md5(piece).alias("chunk_md5"),
    )


@query(
    "op_bpe_pair_counts",
    oracle="""
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ),
        tc AS (
          SELECT t, COUNT(*) AS c FROM tok
          WHERE length(t) >= 2 GROUP BY t
        ),
        pairs AS (
          SELECT substring(t, i, 1) AS a,
                 substring(t, i + 1, 1) AS b,
                 c
          FROM tc, LATERAL (
            SELECT unnest(generate_series(1, length(t) - 1)) AS i
          ) s
        )
        SELECT a, b, CAST(SUM(c) AS BIGINT) AS pair_count
        FROM pairs
        GROUP BY a, b
        ORDER BY pair_count DESC, a, b
        LIMIT 20
    """,
    notes="The hot inner step of BPE tokenizer training (the "
    "most-frequent-adjacent-pair count), distributed the way "
    "production BPE trainers do it: aggregate the corpus to DISTINCT "
    "token frequencies FIRST, then enumerate adjacent symbol pairs "
    "over the vocabulary weighted by those counts. The corpus→vocab "
    "compression is the scale story — pair enumeration runs over "
    "|vocab| rows (31 here, maybe 10^7 at 100 TB), not the 10^11 "
    "token instances; the only full-data pass is the token groupBy "
    "(map-side combined). Symbol pairs come from a JVM "
    "sequence+transform+explode (no Python); the merge loop's later "
    "iterations reuse the same shape over pair-merged symbol arrays. "
    "Total-order LIMIT (count DESC, pair) keeps both engines on the "
    "same top 20.",
    tags=("text", "scale"),
)
def op_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs weighted by token frequency —
    BPE merge candidate scoring."""
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.length("t") >= 2)
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    pairs = tc.select(
        "c",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.struct(
                    F.substring(F.col("t"), i, F.lit(1)).alias("a"),
                    F.substring(F.col("t"), i + 1, F.lit(1)).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "c")
        .groupBy("a", "b")
        .agg(F.sum("c").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(20)
    )


@query(
    "op_ngram_lm_counts",
    oracle="""
        WITH toks AS (
          SELECT list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS t
          FROM documents
        ),
        tri AS (
          SELECT t[u.i] AS w1, t[u.i + 1] AS w2, t[u.i + 2] AS w3
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) u
          WHERE len(t) >= 3
        ),
        cnt AS (
          SELECT w1, w2, w3, COUNT(*) AS n3 FROM tri GROUP BY 1, 2, 3
        )
        SELECT w1, w2, w3,
               CAST(n3 AS BIGINT) AS tri_count,
               CAST(SUM(n3) OVER (PARTITION BY w1, w2) AS BIGINT)
                   AS ctx_count
        FROM cnt
        ORDER BY tri_count DESC, w1, w2, w3
        LIMIT 50
    """,
    notes="Trigram language-model count table — the classical-LM "
    "sibling of op_bpe_train in the tokenizer/LM corpus toolchain: "
    "top trigrams with their bigram CONTEXT totals, from which the "
    "MLE conditional p(w3|w1,w2) = tri_count/ctx_count follows "
    "(emitted as exact integer counts, not the division, so the "
    "driver hash is float-free). ctx_count sums over trigram "
    "continuations (not raw bigram occurrences) — the correct LM "
    "denominator, computed as a window sum over the already-"
    "aggregated trigram table: at 100 TB that second pass runs over "
    "|distinct trigrams| (sublinear in corpus size, Heaps' law), "
    "never the token stream; the only corpus-scale work is the one "
    "trigram groupBy with map-side combine. JVM "
    "transform/explode enumeration (no Python); total-order LIMIT "
    "keeps both engines on the same top 50.",
    tags=("text", "scale"),
)
def op_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 trigrams with MLE context denominators."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.filter(
            F.split(F.lower("text"), " "), lambda x: x != F.lit("")
        ).alias("t")
    ).filter(F.size("t") >= 3)
    tri = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), i + 1).alias("w2"),
                    F.element_at(F.col("t"), i + 2).alias("w3"),
                ),
            )
        ).alias("g")
    ).select("g.w1", "g.w2", "g.w3")
    cnt = tri.groupBy("w1", "w2", "w3").agg(
        F.count("*").cast("bigint").alias("tri_count")
    )
    ctx = F.sum("tri_count").over(W.partitionBy("w1", "w2"))
    return (
        cnt.withColumn("ctx_count", ctx.cast("bigint"))
        .orderBy(F.desc("tri_count"), "w1", "w2", "w3")
        .limit(50)
    )


def _enum_8grams(d: DataFrame) -> DataFrame:
    """(doc_id, gram) for every 8-token window — JVM transform +
    explode, no Python in the loop."""
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), " "), lambda x: x != F.lit("")
        ).alias("t"),
    ).filter(F.size("t") >= 8)
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 7),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("t"), i, F.lit(8))
                ),
            )
        ).alias("gram"),
    )


@query(
    "op_duplicate_ngram_spans",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS t
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 array_to_string(t[u.i : u.i + 7], ' ') AS gram
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) u
          WHERE len(t) >= 8
        )
        SELECT gram,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_occur,
               MIN(doc_id) AS example_doc
        FROM grams
        GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
        ORDER BY n_docs DESC, n_occur DESC, gram
        LIMIT 30
    """,
    notes="Cross-document repeated-span detection — the exact-"
    "substring dedup signal (a la 'Deduplicating Training Data Makes "
    "Language Models Better'): every 8-token window is enumerated "
    "JVM-side (transform over index sequence + explode, no Python), "
    "grouped corpus-wide, and spans appearing in >=2 DISTINCT "
    "documents surface with their document/occurrence counts and an "
    "example doc — the spans a span-level deduper would excise. "
    "Complements the EXISTING doc-level tiers (minhash/simhash = "
    "whole-doc similarity, winnowing = per-doc fingerprints): this "
    "finds the literal shared text. Scale posture (r6: the hash-key "
    "refinement is IMPLEMENTED, plan-asserted in tests/test_plans.py): "
    "the corpus-wide exchanges carry (xxhash64(gram), doc_id) — "
    "fixed-width 16-byte keys, never the ~8x-corpus-bytes gram "
    "strings; the count_distinct two-phase expand runs on hashes too. "
    "Strings are recovered ONLY for rows that can still reach the "
    "top 30 under the (n_docs, n_occur, gram) total order: the 30-row "
    "boundary is collected (bounded metadata), and the boundary-or-"
    "better survivors (<=30 + ties) are recovered from their OWN "
    "example_docs — a broadcast point-lookup of <=|cand| documents "
    "(every >=2-doc span occurs in its min doc_id by construction), "
    "so the recovery pass reads ~30 documents, not the corpus. Cost: "
    "ONE corpus scan + hash-keyed shuffles + an O(candidates) "
    "recovery job; a 64-bit collision merges two spans' counts with "
    "probability ~n^2/2^65 — documented, not silent. Total-order "
    "LIMIT keeps both engines on the same top 30.",
    tags=("text", "dedup", "scale"),
)
def op_duplicate_ngram_spans(
    spark: SparkSession, sf_dir: str, _materialize: bool = True
) -> DataFrame:
    """Top-30 8-token spans shared verbatim across documents.

    ``_materialize=False`` skips the eager localCheckpoint so plan
    tests can inspect the recovery pipeline's physical plan."""
    d = load(spark, sf_dir, "documents")
    # corpus-wide aggregation on FIXED-WIDTH hash keys: the wide
    # exchanges carry (gh, doc_id), never the gram strings. The
    # survivor set (>=2-doc spans, hash-keyed fixed-width rows — a
    # small fraction of the corpus) is cached because it feeds both
    # the boundary probe and the candidate filter.
    survivors = (
        _enum_8grams(d)
        .select(F.xxhash64("gram").alias("gh"), "doc_id")
        .groupBy("gh")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occur"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .persist()
    )
    try:
        # 30-row order boundary (bounded metadata to the driver, like
        # the IVF centers): any row that can still reach the top 30 is
        # boundary-or-better on (n_docs desc, n_occur desc) — ties at
        # the boundary are kept because the final order tiebreaks on
        # the gram string, which only the recovered set can decide
        top = (
            survivors.orderBy(F.desc("n_docs"), F.desc("n_occur"))
            .limit(30)
            .collect()
        )
        if not top:
            return spark.createDataFrame(
                [],
                "gram string, n_docs bigint, n_occur bigint, "
                "example_doc bigint",
            )
        b_docs, b_occ = min((r["n_docs"], r["n_occur"]) for r in top)
        cand = survivors.filter(
            (F.col("n_docs") > b_docs)
            | ((F.col("n_docs") == b_docs) & (F.col("n_occur") >= b_occ))
        )
        # recover strings for the tiny candidate set only — and only
        # from the docs that are KNOWN to contain them: every >=2-doc
        # span occurs in its example_doc (= min doc_id), so the
        # recovery pass enumerates the grams of <=|cand| point-looked-
        # up documents (broadcast id join, pushdown-prunable), never
        # re-scans the corpus. The <=30-row result is materialized
        # eagerly so the cache can be released before returning the
        # (lazy) DataFrame.
        # no distinct: repeated example_docs just multiply the tiny
        # broadcast probe; the trailing dropDuplicates(gh) dedups
        ex = cand.select(F.col("example_doc").alias("doc_id"))
        out = (
            _enum_8grams(d.join(F.broadcast(ex), "doc_id"))
            .select("gram", F.xxhash64("gram").alias("gh"))
            .join(F.broadcast(cand), "gh")
            .dropDuplicates(["gh"])
            .select("gram", "n_docs", "n_occur", "example_doc")
            .orderBy(F.desc("n_docs"), F.desc("n_occur"), "gram")
            .limit(30)
        )
        return out.localCheckpoint(eager=True) if _materialize else out
    finally:
        survivors.unpersist()


@query(
    "op_doc_self_repetition",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS t
          FROM documents
        ),
        g AS (
          SELECT doc_id,
                 list_transform(
                   generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS grams
          FROM toks
          WHERE len(t) >= 3
        )
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(grams) - len(list_distinct(grams)) AS BIGINT)
                 AS n_dup,
               CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                 / len(grams) AS dup_frac
        FROM g
        ORDER BY dup_frac DESC, doc_id
        LIMIT 50
    """,
    notes="Intra-document self-repetition — the Gopher-rules quality "
    "signal the cross-doc tiers don't cover: a document that repeats "
    "ITSELF (boilerplate loops, scraped nav bars, degenerate "
    "generations) is low-quality even if globally unique. Per doc, "
    "the fraction of 3-gram instances that duplicate an earlier "
    "instance in the SAME doc: 1 - |distinct grams|/|grams|, computed "
    "entirely with JVM array expressions INSIDE the row (transform + "
    "array_distinct) — a ZERO-SHUFFLE map over the corpus; the only "
    "movement is the TakeOrderedAndProject top-50 (most-repetitive "
    "docs first, doc_id tiebreak). dup_frac is one exact-integer "
    "division on both engines, so the double hash-matches. At 100 TB "
    "this is the cheapest possible shape: score every doc in one "
    "scan, no exchange, and feed the fraction to the same gate as "
    "op_quality_filter.",
    tags=("text", "quality", "scale"),
)
def op_doc_self_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most self-repetitive docs by duplicated-3-gram fraction."""
    d = load(spark, sf_dir, "documents")
    t = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 2),
        lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(3))),
    )
    scored = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 3)
        .select("doc_id", grams.alias("grams"))
        .select(
            "doc_id",
            F.size("grams").cast("bigint").alias("n_grams"),
            (F.size("grams") - F.size(F.array_distinct("grams")))
            .cast("bigint")
            .alias("n_dup"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup").cast("double") / F.col("n_grams"),
        )
    )
    return scored.orderBy(F.desc("dup_frac"), "doc_id").limit(50)


@query(
    "op_doc_duplication_coverage",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS t
          FROM documents
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
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(*) FILTER (is_shared) AS BIGINT) AS n_shared,
               CAST(COUNT(*) FILTER (is_shared) AS DOUBLE) / COUNT(*)
                 AS shared_frac
        FROM marked
        GROUP BY doc_id
        ORDER BY shared_frac DESC, doc_id
        LIMIT 50
    """,
    notes="Per-document cross-corpus duplication coverage — the doc-"
    "level decision variable behind span dedup (Lee et al.: how much "
    "of THIS doc is verbatim elsewhere?): the fraction of a doc's "
    "distinct 8-grams that also appear in >=1 OTHER document, the "
    "score a curation gate thresholds to drop mostly-duplicated "
    "docs. Complements op_duplicate_ngram_spans (which finds the "
    "spans) and the minhash tiers (whole-doc similarity). Scale "
    "shape (r6 hardened): per-doc distinct grams are computed INSIDE "
    "the row (array_distinct before explode — no dedup exchange); "
    "the corpus-wide sharing test is a map-side-combined groupBy on "
    "xxhash64(gram) fixed-width keys JOINED back to the pair stream "
    "(AQE-skew-splittable — a window here would pin a corpus-wide "
    "boilerplate gram's every row to one task), and the per-doc "
    "rollup one doc_id groupBy — every exchange on fixed-width keys, "
    "plan-asserted; gram STRINGS never shuffle (the oracle "
    "groups by string — 64-bit collisions, probability ~n^2/2^65, "
    "would surface as a hash mismatch). shared_frac is one exact-"
    "integer division on both engines.",
    tags=("text", "dedup", "quality", "scale"),
)
def op_doc_duplication_coverage(
    spark: SparkSession, sf_dir: str, _materialize: bool = True
) -> DataFrame:
    """Top-50 docs by fraction of 8-grams shared with other docs.

    ``_materialize=False`` returns the lazy pipeline (pair-stream
    cache retained, caller-owned) so plan tests can inspect it."""
    d = load(spark, sf_dir, "documents")
    t = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 7),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(8))),
        )
    )
    dg = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 8)
        .select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", F.xxhash64("gram").alias("gh"))
    )
    # sharedness via map-side-combined groupBy + AQE-splittable join,
    # not a window: a boilerplate gram shared corpus-wide would pin
    # every one of its rows to a single window task (see
    # op_lm_doc_score's notes). The pair stream feeds both the count
    # build and the probe, so it is cached for the op's duration and
    # the 50-row answer materialized eagerly before release. The lazy
    # (_materialize=False) path skips the persist entirely — plan
    # tests never execute the pipeline, and a caller-owned cache with
    # no handle to unpersist would accumulate across calls (r6
    # advice).
    if _materialize:
        dg = dg.persist()
    try:
        counts = dg.groupBy("gh").agg(F.count("*").alias("nd"))
        out = (
            dg.join(counts, "gh")
            .withColumn("is_shared", F.col("nd") >= 2)
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_grams"),
                F.count(F.when(F.col("is_shared"), 1))
                .cast("bigint")
                .alias("n_shared"),
            )
            .withColumn(
                "shared_frac",
                F.col("n_shared").cast("double") / F.col("n_grams"),
            )
            .orderBy(F.desc("shared_frac"), "doc_id")
            .limit(50)
        )
        if not _materialize:
            return out
        return out.localCheckpoint(eager=True)
    finally:
        if _materialize:
            dg.unpersist()


@query(
    "op_lm_doc_score",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS t
          FROM documents
        ),
        tri AS (
          SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2, t[u.i + 2] AS w3
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) u
          WHERE len(t) >= 3
        ),
        m AS (
          SELECT doc_id,
                 COUNT(*) OVER (PARTITION BY w1, w2, w3) AS tri_c,
                 COUNT(*) OVER (PARTITION BY w1, w2) AS ctx_c
          FROM tri
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tri,
               CAST(SUM((tri_c * 1000000) // ctx_c) AS BIGINT)
                 AS sum_p_fp,
               CAST(SUM((tri_c * 1000000) // ctx_c) AS DOUBLE) / COUNT(*)
                 AS avg_p_fp
        FROM m
        GROUP BY doc_id
        ORDER BY avg_p_fp ASC, doc_id
        LIMIT 50
    """,
    notes="LM-based document scoring — the CCNet/perplexity-filter "
    "curation step, in EXACT arithmetic: every document is scored "
    "under the corpus's own trigram model as the average conditional "
    "probability p(w3|w1,w2) = count(w1w2w3)/count(w1w2) over its "
    "trigram instances, and the 50 most-surprising (lowest-score) "
    "docs surface — the ones a perplexity gate would drop or route "
    "for review. Real perplexity exponentiates a mean LOG-prob; ln() "
    "drifts by ulps across engines (see op_bm25), so the score keeps "
    "the rational form and fixes each instance's probability to "
    "integer fixed-point with truncating division "
    "((tri_c*1e6) DIV ctx_c — both engines' integer division "
    "semantics agree on positives), making the per-doc SUM "
    "order-independent and the final double one identical division. "
    "Scale shape (r6 hardened): trigram instances are enumerated "
    "once; both count tables build as map-side-combined groupBys on "
    "xxhash64 keys (fixed-width — the span-op discipline; string "
    "collisions ~n^2/2^65 documented) and attach to the instance "
    "stream via JOINS, deliberately NOT windows — a window "
    "partitioned on a Zipf-hot trigram drags every instance into one "
    "task with no partial aggregation (straggler/OOM at 100 TB), "
    "while the joins are AQE-skew-splittable; the model is never "
    "materialized driver-side. Trains-on-self like "
    "CCNet's target-domain LM; swapping the count source for a "
    "reference corpus's tables (op_ngram_lm_counts) changes one "
    "input, not the shape.",
    tags=("text", "quality", "scale"),
)
def op_lm_doc_score(
    spark: SparkSession, sf_dir: str, _materialize: bool = True
) -> DataFrame:
    """50 most-surprising docs by average trigram probability under
    the corpus trigram model (exact fixed-point).

    ``_materialize=False`` returns the lazy pipeline (instance cache
    retained, caller-owned) so plan tests can inspect it."""
    d = load(spark, sf_dir, "documents")
    t = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    tri = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + 1).alias("w2"),
                        F.element_at(F.col("t"), i + 2).alias("w3"),
                    ),
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.xxhash64("g.w1", "g.w2", "g.w3").alias("th"),
            F.xxhash64("g.w1", "g.w2").alias("ch"),
        )
    )
    # counts attach via JOINS, not windows: a window partitioned on a
    # Zipf-hot trigram colocates ALL its instances in one task with no
    # partial aggregation (the straggler/OOM shape at 100 TB), while
    # groupBy counts combine map-side and the instance joins are
    # AQE-skew-splittable — the same formulation as the heldout
    # variant below. The instance stream feeds three consumers
    # (tc, cc, probe), so it is cached for the op's duration and the
    # 50-row answer materialized eagerly before release. Lazy path
    # skips the persist — plan tests never execute, and an orphaned
    # caller-owned cache would accumulate across calls (r6 advice).
    if _materialize:
        tri = tri.persist()
    try:
        tc = tri.groupBy("th").agg(F.count("*").alias("tri_c"))
        cc = tri.groupBy("ch").agg(F.count("*").alias("ctx_c"))
        m = tri.join(tc, "th").join(cc, "ch")
        out = (
            m.select(
                "doc_id",
                F.expr("tri_c * 1000000 DIV ctx_c").alias("p_fp"),
            )
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_tri"),
                F.sum("p_fp").cast("bigint").alias("sum_p_fp"),
            )
            .withColumn(
                "avg_p_fp",
                F.col("sum_p_fp").cast("double") / F.col("n_tri"),
            )
            .orderBy(F.asc("avg_p_fp"), "doc_id")
            .limit(50)
        )
        if not _materialize:
            return out
        return out.localCheckpoint(eager=True)
    finally:
        if _materialize:
            tri.unpersist()


@query(
    "op_span_excise",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS t
          FROM documents
        ),
        g AS (
          SELECT doc_id, u.i AS i,
                 array_to_string(t[u.i : u.i + 7], ' ') AS gram
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) u
          WHERE len(t) >= 8
        ),
        sh AS (
          SELECT doc_id, i FROM (
            SELECT doc_id, i,
                   MIN(doc_id) OVER (PARTITION BY gram)
                     <> MAX(doc_id) OVER (PARTITION BY gram) AS s
            FROM g
          ) WHERE s
        ),
        cov AS (
          SELECT DISTINCT doc_id, u2.p
          FROM sh,
               LATERAL (SELECT unnest(generate_series(i, i + 7)) AS p) u2
        ),
        covs AS (
          SELECT doc_id, list(p) AS lp FROM cov GROUP BY doc_id
        )
        SELECT k.doc_id,
               CAST(len(k.t) AS BIGINT) AS n_tokens,
               CAST(COALESCE(len(c.lp), 0) AS BIGINT) AS n_excised,
               -- COALESCE: DuckDB's array_to_string of an empty list
               -- is NULL; Spark's concat_ws is '' (fully-excised docs)
               COALESCE(array_to_string(
                 list_transform(
                   list_filter(
                     generate_series(1, len(k.t)),
                     j -> NOT list_contains(COALESCE(c.lp, []), j)),
                   j -> k.t[j]),
                 ' '), '') AS clean_text
        FROM toks k LEFT JOIN covs c USING (doc_id)
    """,
    notes="Span EXCISION — the action step of exact-substring dedup "
    "(Lee et al.): every token position covered by an 8-gram that "
    "also appears in ANOTHER document is cut, and the cleaned text "
    "is rebuilt from the surviving tokens — the transform a span-"
    "level deduper actually applies to the corpus, where "
    "op_duplicate_ngram_spans only reports the spans and "
    "op_doc_duplication_coverage only scores them. Cross-doc "
    "sharedness per gram is min(doc_id)!=max(doc_id) from a map-side-"
    "combined groupBy on the xxhash64 gram key, attached back to the "
    "instances by an AQE-skew-splittable LEFT SEMI join whose build "
    "side holds only the SHARED grams (r6 hardened — a window here "
    "would pin a hot gram's every instance to one task with no "
    "partial aggregation); covered positions then explode to "
    "(doc_id, pos) pairs, roll up to a per-doc position set, and one "
    "broadcast-free doc_id join rebuilds each document in-row with "
    "array expressions. Exchanges: gh groupBy/join + doc_id rollup + "
    "doc_id join — all fixed-width keys (plan-asserted); the rebuilt "
    "strings move only doc-locally. "
    "Every doc is emitted (clean docs pass through unchanged), so "
    "the op composes as a corpus map stage in a curation pipeline.",
    tags=("text", "dedup", "scale"),
)
def op_span_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove cross-document duplicated 8-gram spans from every doc;
    emit the cleaned text with excision counts."""
    d = load(spark, sf_dir, "documents")
    t = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    toks_df = d.select("doc_id", t.alias("t"))
    g = toks_df.filter(F.size("t") >= 8).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 7),
                lambda i: F.struct(
                    i.cast("int").alias("i"),
                    F.xxhash64(
                        F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(8)))
                    ).alias("gh"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.i", "s.gh")
    # sharedness via map-side-combined groupBy + AQE-splittable join,
    # not a window (see op_lm_doc_score's notes on hot-gram skew):
    # only ghs spanning >=2 docs survive the filter, so the join's
    # build side carries shared grams only
    stats = (
        g.groupBy("gh")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .filter(F.col("mn") != F.col("mx"))
        .select("gh")
    )
    cov = (
        g.join(stats, "gh", "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence("i", F.col("i") + 7)).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("lp"))
    )
    lp = F.coalesce(F.col("lp"), F.array().cast("array<int>"))
    # guard the empty-token doc: Spark's sequence(1, 0) is the
    # DESCENDING [1, 0] (not [] like DuckDB's generate_series), and
    # element_at(t, 0) throws — emit an empty position list instead
    positions = F.when(
        F.size("t") >= 1, F.sequence(F.lit(1), F.size("t"))
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(positions, lambda j: ~F.array_contains(lp, j))
    return toks_df.join(cov, "doc_id", "left").select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.size(lp).cast("bigint").alias("n_excised"),
        F.concat_ws(
            " ",
            F.transform(kept, lambda j: F.element_at(F.col("t"), j)),
        ).alias("clean_text"),
    )


@query(
    "op_lm_doc_score_heldout",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS t
          FROM documents
        ),
        tri AS (
          SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2, t[u.i + 2] AS w3
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, len(t) - 2)) AS i) u
          WHERE len(t) >= 3
        ),
        train AS (SELECT * FROM tri WHERE doc_id % 2 = 0),
        tc AS (
          SELECT w1, w2, w3, COUNT(*) AS c FROM train GROUP BY w1, w2, w3
        ),
        cc AS (SELECT w1, w2, COUNT(*) AS c FROM train GROUP BY w1, w2),
        v AS (
          SELECT COUNT(DISTINCT u.tok) AS n
          FROM (SELECT t FROM toks WHERE doc_id % 2 = 0) s,
               LATERAL (SELECT unnest(s.t) AS tok) u
        ),
        scored AS (
          SELECT s.doc_id,
                 ((COALESCE(tc.c, 0) + 1) * 1000000)
                   // (COALESCE(cc.c, 0) + v.n) AS p_fp
          FROM tri s
          LEFT JOIN tc USING (w1, w2, w3)
          LEFT JOIN cc USING (w1, w2)
          CROSS JOIN v
          WHERE s.doc_id % 2 = 1
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tri,
               CAST(SUM(p_fp) AS BIGINT) AS sum_p_fp,
               CAST(SUM(p_fp) AS DOUBLE) / COUNT(*) AS avg_p_fp
        FROM scored
        GROUP BY doc_id
        ORDER BY avg_p_fp ASC, doc_id
        LIMIT 50
    """,
    notes="HELDOUT LM scoring — the true CCNet decomposition "
    "op_lm_doc_score's self-scoring variant approximates: the "
    "trigram model TRAINS on one corpus split (even doc_ids) and "
    "SCORES the other, with add-one (Laplace) smoothing — "
    "p = (tri_c+1)/(ctx_c+|V|) — so unseen trigrams and contexts "
    "get well-defined exact probabilities; every term is integer "
    "fixed-point ((tri_c+1)*1e6 integer-DIV (ctx_c+V)), so the "
    "cross-split joins stay hash-checkable. Shape: the count tables "
    "attach to the score split via LEFT JOINs on xxhash64 gram keys "
    "(not windows — the counts come from a DIFFERENT row set), "
    "still fixed-width shuffle payloads; |V| is one scalar "
    "(count_distinct of hashed tokens) broadcast as a literal "
    "cross-join. Swapping the train split for a curated reference "
    "corpus is a one-line change — this is the quality-filter "
    "pipeline's production form. Hash-collision caveat as the other "
    "gram ops (~n^2/2^65, oracle uses strings).",
    tags=("text", "quality", "scale"),
)
def op_lm_doc_score_heldout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Score odd-doc_id docs under the even-doc trigram model with
    add-one smoothing (exact fixed-point)."""
    d = load(spark, sf_dir, "documents")
    t = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    toks_df = d.select("doc_id", t.alias("t"))
    tri = (
        toks_df.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i).alias("w1"),
                        F.element_at(F.col("t"), i + 1).alias("w2"),
                        F.element_at(F.col("t"), i + 2).alias("w3"),
                    ),
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.xxhash64("g.w1", "g.w2", "g.w3").alias("th"),
            F.xxhash64("g.w1", "g.w2").alias("ch"),
        )
    )
    # the trigram stream feeds three consumers (tc, cc, probe) plus
    # the vocab count scans toks_df — persist like op_lm_doc_score
    # does, or the corpus tokenize+explode runs four times per call
    # (review finding; the sibling documents this exact discipline)
    tri = tri.persist()
    try:
        train = tri.filter(F.col("doc_id") % 2 == 0)
        tc = train.groupBy("th").agg(F.count("*").alias("tc"))
        cc = train.groupBy("ch").agg(F.count("*").alias("cc"))
        vocab = int(
            toks_df.filter(F.col("doc_id") % 2 == 0)
            .select(F.explode("t").alias("tok"))
            .agg(F.count_distinct(F.xxhash64("tok")))
            .first()[0]
        )
        p_fp = F.expr(
            f"(coalesce(tc, 0) + 1) * 1000000"
            f" DIV (coalesce(cc, 0) + {vocab})"
        )
        out = (
            tri.filter(F.col("doc_id") % 2 == 1)
            .join(tc, "th", "left")
            .join(cc, "ch", "left")
            .select("doc_id", p_fp.alias("p_fp"))
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_tri"),
                F.sum("p_fp").cast("bigint").alias("sum_p_fp"),
            )
            .withColumn(
                "avg_p_fp",
                F.col("sum_p_fp").cast("double") / F.col("n_tri"),
            )
            .orderBy(F.asc("avg_p_fp"), "doc_id")
            .limit(50)
        )
        return out.localCheckpoint(eager=True)
    finally:
        tri.unpersist()


@query(
    "op_compression_ratio",
    oracle=None,  # zlib is not expressible in SQL; pinned bit-exact
    # against the same Python zlib in tests/test_compression_ratio.py
    notes="Compression-ratio quality signal (the Gopher/RefinedWeb "
    "repetitiveness proxy): highly repetitive or boilerplate text "
    "compresses far below natural prose, so zlib_len/raw_len is a "
    "cheap single-pass gate that catches repetition patterns n-gram "
    "fractions miss (long-period loops, templated spans). "
    "DETERMINISM: zlib level 6 output length is a pure function of "
    "the input bytes for a fixed zlib build, so the op is exactly "
    "reproducible within an environment and pinned bit-exact against "
    "direct Python zlib in tests (rows-only for the driver: no SQL "
    "engine exposes zlib). Scale shape: Arrow-batched pandas_udf "
    "(never row-at-a-time), map-only — the signal rides the corpus "
    "scan like the other curation gates; the final sort is a top-50 "
    "TakeOrderedAndProject.",
    tags=("text", "quality", "udf"),
)
def op_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc zlib compression ratio; 50 most-compressible (most
    repetitive) docs first."""
    from pyspark.sql.functions import pandas_udf

    def _zlib_len(texts):
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        ).astype("int64")

    # no type hints: the module's future-annotations turns them into
    # strings pandas_udf can't resolve; explicit returnType instead
    zlib_len = pandas_udf(_zlib_len, "bigint")

    d = load(spark, sf_dir, "documents")
    return (
        # compressibility of nothing is undefined: NULL text would
        # kill the encode in the UDF, and an EMPTY doc would make the
        # ratio an ANSI 0/0 — both gated here (dirty-corpus audit,
        # r11-restart; the clean fixtures make this a no-op)
        d.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_raw"),
            zlib_len("text").alias("n_zlib"),
        )
        .withColumn(
            "ratio", F.col("n_zlib").cast("double") / F.col("n_raw")
        )
        .orderBy(F.asc("ratio"), "doc_id")
        .limit(50)
    )


@query(
    "op_text_normalize",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_raw,
               trim(regexp_replace(
                     lower(nfc_normalize(text)), '[ \t\n\r]+', ' ', 'g'))
                 AS norm,
               CAST(length(trim(regexp_replace(
                     lower(nfc_normalize(text)), '[ \t\n\r]+', ' ', 'g')))
                 AS BIGINT) AS n_chars_norm
        FROM documents
    """,
    notes="Unicode text normalization — the canonicalization pass "
    "every multilingual corpus runs before dedup/tokenization so "
    "byte-distinct but canonically-equal strings (precomposed é vs "
    "e+combining accent) collide: NFC -> lowercase -> whitespace-run "
    "collapse -> trim. Spark has no built-in Unicode normalizer, so "
    "NFC is an Arrow-batched pandas_udf over Python unicodedata; "
    "DuckDB's nfc_normalize is verified char-for-char equal to "
    "unicodedata on combining marks, ligatures, and halfwidth forms "
    "(tests/test_text_normalize.py — the fixture corpus is ASCII, so "
    "the crafted suite carries the non-ASCII semantics). Scale "
    "shape: map-only, rides the corpus scan; the lower/collapse/trim "
    "stages stay JVM-side so only the NFC hop pays the Arrow "
    "transfer.",
    tags=("text", "quality", "udf"),
)
def op_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC + casefold + whitespace-collapse canonical form per doc."""
    from pyspark.sql.functions import pandas_udf

    def _nfc(texts):
        import unicodedata

        return texts.map(lambda t: unicodedata.normalize("NFC", t))

    nfc = pandas_udf(_nfc, "string")

    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(F.lower(nfc("text")), "[ \t\n\r]+", " ")
    )
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_raw"),
        norm.alias("norm"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )
