"""Deterministic sampling, domain mixing, and shard assignment — the
dataset-construction stage of a training-data pipeline.

After filtering and dedup, a corpus is (a) rebalanced across domains
(per-language / per-source sampling rates), (b) assigned mixture
weights, and (c) written out as fixed-count shards. All three are
expressed with pure integer arithmetic on the document key so the
DuckDB oracle reproduces them bit-for-bit — no RNG: a Knuth
multiplicative hash of ``doc_id`` stands in for the uniform draw,
which also makes every sample reproducible across runs and engines
(the property an actual training pipeline wants from its sampler).

Scale posture: each op is one small aggregate (per-domain counts —
dozens of rows) broadcast back over a scan-speed map stage; nothing
shuffles the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: Knuth multiplicative hash constant (2^32 / phi) and modulus. The
#: product doc_id * KNUTH stays under 2^63 for doc_id < ~3.5e9; for
#: larger id spaces swap in xxhash64 (rows-only — Spark and DuckDB
#: don't share a 64-bit hash), or pre-fold the id with a modulus.
_KNUTH = 2654435761
_MOD = 1_000_000

#: per-language target: keep at most this many documents per lang
_TARGET_PER_LANG = 60


def _selector() -> F.Column:
    """Uniform-looking deterministic draw in [0, 1_000_000)."""
    return F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(_MOD))


_SQL_SELECTOR = f"((doc_id * {_KNUTH}) % {_MOD} + {_MOD}) % {_MOD}"


@query(
    "op_stratified_sample",
    oracle=f"""
        WITH counts AS (
          SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN counts c ON d.lang = c.lang
        WHERE {_SQL_SELECTOR}
              < {_MOD}.0 * LEAST(1.0, {_TARGET_PER_LANG}.0 / c.n_lang)
    """,
    notes="Deterministic stratified downsampling: per-language keep "
    "rate = min(1, target/n), applied via a Knuth multiplicative hash "
    "of doc_id — reproducible across engines and runs, unlike "
    "rand()-based sampling. The rate table is a tiny aggregate "
    "broadcast into a scan-speed filter.",
    tags=("sampling", "text"),
)
def op_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance a corpus by capping each language stratum at a target
    count, keeping a deterministic pseudo-uniform subset.

    Scale posture: counts is |languages| rows → broadcast; the corpus
    is filtered in place, never shuffled."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_lang"))
    rate = F.least(
        F.lit(1.0), F.lit(float(_TARGET_PER_LANG)) / F.col("n_lang")
    )
    return (
        d.join(F.broadcast(counts), "lang")
        .filter(_selector() < F.lit(float(_MOD)) * rate)
        .select("doc_id", "lang")
    )


@query(
    "op_domain_mixture",
    oracle="""
        WITH counts AS (
          SELECT lang, COUNT(*) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY lang
        ),
        tot AS (
          SELECT COUNT(*) AS n_langs,
                 CAST(SUM(n_docs) AS BIGINT) AS n_total
          FROM counts
        )
        SELECT c.lang, c.n_docs, c.total_chars,
               CAST(c.n_docs AS DOUBLE) / t.n_total AS actual_frac,
               1.0 / t.n_langs AS target_frac,
               (1.0 / t.n_langs)
                   / (CAST(c.n_docs AS DOUBLE) / t.n_total) AS weight
        FROM counts c CROSS JOIN tot t
    """,
    notes="Domain-mixture weighting: per-language document/char "
    "counts, actual vs uniform target proportions, and the sampling "
    "weight (target/actual) a data loader would apply per domain. "
    "Integer counts + one double division chain, written identically "
    "on both sides.",
    tags=("sampling", "agg", "text"),
)
def op_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute per-domain mixture weights toward a uniform target —
    the table that drives weighted interleaving of training domains.

    Scale posture: one per-domain aggregate (dozens of rows), one
    single-row total, both broadcast — corpus scanned once."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    tot = counts.agg(
        F.count("*").alias("n_langs"),
        F.sum("n_docs").alias("n_total"),
    )
    actual = F.col("n_docs").cast("double") / F.col("n_total")
    target = F.lit(1.0) / F.col("n_langs")
    return counts.join(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "total_chars",
        actual.alias("actual_frac"),
        target.alias("target_frac"),
        (target / actual).alias("weight"),
    )


@query(
    "op_shard_assign",
    oracle=f"""
        SELECT ((doc_id * {_KNUTH}) % 64 + 64) % 64 AS shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
               MIN(doc_id) AS min_doc,
               MAX(doc_id) AS max_doc
        FROM documents
        GROUP BY 1
    """,
    notes="Training-shard assignment: hash-distribute documents over "
    "64 output shards and report per-shard row/char balance — the "
    "manifest a shard writer (df.write.partitionBy('shard_id')) "
    "produces. Hashing (not doc_id ranges) keeps shards balanced "
    "when ids are clustered by source.",
    tags=("sampling", "io"),
)
def op_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard ids + balance audit for sharded output.

    Scale posture: one groupBy over 64 keys (map-side partials make
    the shuffle 64 rows per task); the actual shard WRITE would use
    the same expression as a partition column, giving 64 parallel
    writers with no skew."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn(
            "shard_id", F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(64))
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "op_grouped_sample",
    oracle=f"""
        SELECT doc_id, source, n_chars
        FROM (
          SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {_SQL_SELECTOR}, doc_id) AS rn
          FROM documents
        )
        WHERE rn <= 25
    """,
    notes="Exactly-N-per-group sampling: order each group by the "
    "Knuth-hash draw (a deterministic uniform proxy) and keep the "
    "first 25 — the 'give me a review sample from every source' op. "
    "Unlike fraction-based sampling (op_stratified_sample), the "
    "count per group is EXACT, which audits and eval-set builders "
    "need. Catalyst plans the rn<=25 filter as WindowGroupLimit: "
    "each task pre-trims to 25 rows per group before the exchange, "
    "so a billion-document source still ships only 25 rows per "
    "task.",
    tags=("sampling",),
)
def op_grouped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25-document sample per source."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(_selector(), "doc_id")
    )
    return (
        d.withColumn("rn", rn)
        .filter(F.col("rn") <= 25)
        .select("doc_id", "source", "n_chars")
    )


@query(
    "op_epoch_shuffle",
    oracle="""
        WITH drawn AS (
          SELECT doc_id, e.epoch,
                 (doc_id * (2654435761 + e.epoch * 2246822519)) % 1000000
                   AS draw
          FROM documents, (VALUES (0), (1)) AS e(epoch)
        )
        SELECT epoch, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                                       ORDER BY draw, doc_id) AS BIGINT)
                 AS position
        FROM drawn
    """,
    notes="Deterministic EPOCH SHUFFLE — the training-loader "
    "requirement sampling ops don't cover: each epoch needs a "
    "DIFFERENT but REPRODUCIBLE global permutation of the corpus "
    "(epoch 0's order must never correlate with epoch 1's, and any "
    "worker recomputing the order must agree byte-for-byte). The "
    "draw is a multiplicative hash whose MULTIPLIER varies per epoch "
    "(an additive salt would merely rotate the order — measured rank "
    "correlation 0.77; distinct multipliers give rho~0) — the same "
    "shared-arithmetic uniform proxy the sampling family uses, so "
    "both engines order identically with no RNG. Scale: position assignment is one range-partitioned "
    "sort per epoch (Spark's global ROW_NUMBER via range exchange + "
    "in-partition rank); at 100 TB loaders usually take "
    "ORDER BY draw directly and skip materializing positions — the "
    "op materializes them so the permutation itself is "
    "hash-checkable. The two epochs' permutations are verified "
    "uncorrelated in tests/test_quality.py.",
    tags=("sampling", "scale"),
)
def op_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch global shuffle positions for 2 epochs."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select("doc_id")
    epochs = d.sparkSession.range(2).select(
        F.col("id").cast("int").alias("epoch")
    )
    drawn = d.crossJoin(F.broadcast(epochs)).select(
        "doc_id",
        "epoch",
        F.pmod(
            F.col("doc_id")
            * (F.lit(_KNUTH) + F.col("epoch") * F.lit(2246822519)),
            F.lit(_MOD),
        ).alias("draw"),
    )
    pos = F.row_number().over(
        W.partitionBy("epoch").orderBy("draw", "doc_id")
    )
    return drawn.select(
        "epoch", "doc_id", pos.cast("bigint").alias("position")
    )


@query(
    "op_length_bucketed_batching",
    oracle="""
        WITH lens AS (
          SELECT doc_id,
                 len(list_filter(string_split(lower(text), ' '),
                                 x -> x <> '')) AS n_tokens
          FROM documents
        ),
        assigned AS (
          SELECT doc_id, n_tokens,
                 CAST((n_tokens + 31) // 32 AS BIGINT) AS bucket,
                 CAST((ROW_NUMBER() OVER (
                         PARTITION BY (n_tokens + 31) // 32
                         ORDER BY doc_id) - 1) // 16 AS BIGINT)
                   AS batch_id
          FROM lens
        )
        SELECT bucket, batch_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
               CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT)
                 AS pad_waste
        FROM assigned
        GROUP BY bucket, batch_id
        ORDER BY bucket, batch_id
    """,
    notes="Length-bucketed BATCHING — the training-loader step after "
    "shuffling: documents group into 32-token-wide length buckets, "
    "each bucket packs deterministically into 16-doc batches "
    "(row_number over doc_id), and every batch reports its padding "
    "waste (n_docs*max_len - sum_len — the tokens a fixed-shape "
    "tensor would burn). Bucketing is the standard remedy for "
    "padding blowup under random batching; the emitted waste column "
    "IS the metric that justifies it, so the op doubles as the "
    "loader's efficiency audit. Scale: one hash exchange on bucket "
    "for the window + the rollup reusing the same partitioning; all "
    "arithmetic integer-exact. Composes with op_epoch_shuffle "
    "(shuffle first, bucket second — order inside a bucket would "
    "then follow the epoch draw instead of doc_id; same shape).",
    tags=("sampling", "text", "scale"),
)
def op_length_bucketed_batching(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pack docs into per-length-bucket batches; report pad waste."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    )
    lens = d.select("doc_id", n_tokens.alias("n_tokens"))
    bucket = ((F.col("n_tokens") + 31) / 32).cast("bigint")
    assigned = lens.withColumn("bucket", bucket).withColumn(
        "batch_id",
        (
            (
                F.row_number().over(
                    W.partitionBy("bucket").orderBy("doc_id")
                )
                - 1
            )
            / 16
        ).cast("bigint"),
    )
    return (
        assigned.groupBy("bucket", "batch_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            (F.count("*") * F.max("n_tokens") - F.sum("n_tokens"))
            .cast("bigint")
            .alias("pad_waste"),
        )
        .orderBy("bucket", "batch_id")
    )


@query(
    "op_reservoir_sample",
    oracle="""
        SELECT doc_id, source, n_chars
        FROM (
          SELECT doc_id, source, n_chars,
                 md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
          FROM documents
        )
        ORDER BY h, doc_id
        LIMIT 200
    """,
    notes="Exact-k uniform sample WITHOUT an RNG: keep the k rows "
    "with the smallest md5(doc_id:content) — the bottom-k-by-hash "
    "formulation of reservoir sampling (each row's rank is an i.i.d. "
    "uniform draw, so any k-subset is equally likely), but "
    "REPRODUCIBLE across runs, engines, partitionings, and "
    "insertion orders, which a classic stateful reservoir is not. "
    "Scale: Spark executes ORDER BY+LIMIT as TakeOrderedAndProject "
    "(plan-asserted) — each task keeps a k-row heap and the driver "
    "merges 32*k candidates; no global sort, no corpus shuffle. "
    "Growing the corpus only re-draws the sample, never reorders "
    "work. md5 ties are broken by doc_id (none exist in practice; "
    "determinism must not rest on collision absence).",
    tags=("sampling", "scale"),
)
def op_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k sample = bottom-k by content hash."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
    )
    return (
        d.select("doc_id", "source", "n_chars", h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(200)
        .select("doc_id", "source", "n_chars")
    )


@query(
    "op_importance_resample",
    oracle="""
        WITH counts AS (
          SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ),
        tot AS (
          SELECT COUNT(*) AS n_langs,
                 CAST(SUM(n_docs) AS BIGINT) AS n_total
          FROM counts
        ),
        w AS (
          SELECT c.lang,
                 (1.0 / t.n_langs)
                   / (CAST(c.n_docs AS DOUBLE) / t.n_total) AS weight
          FROM counts c CROSS JOIN tot t
        ),
        assigned AS (
          SELECT d.doc_id, d.lang,
                 CAST(FLOOR(w.weight) AS BIGINT)
                   + CASE WHEN CAST(('0x' || substr(md5(
                            CAST(d.doc_id AS VARCHAR) || ':' || d.text),
                            1, 8)) AS BIGINT) % 1000000
                          < (w.weight - FLOOR(w.weight)) * 1000000.0
                     THEN 1 ELSE 0 END AS copies
          FROM documents d JOIN w ON d.lang = w.lang
        )
        SELECT a.doc_id, a.lang, CAST(u.copy AS BIGINT) AS copy_id
        FROM assigned a,
             LATERAL unnest(generate_series(1, a.copies)) AS u(copy)
    """,
    notes="IMPORTANCE RESAMPLING — applying op_domain_mixture's "
    "weights to the corpus (the step the weight table exists for): "
    "per-language weight w = target/actual, each doc emitted "
    "floor(w) times plus one more when its content-hash fraction "
    "falls below frac(w) — so over-represented domains downsample "
    "(w<1: keep-probability w) and under-represented ones UPSAMPLE "
    "(w>1: whole copies + fractional remainder), with copy_id "
    "numbering the replicas a data loader would interleave. "
    "Deterministic end-to-end: the draw is md5(doc_id:content) like "
    "op_dataset_split, the weights are the same exact double "
    "division chain on both engines, and the emitted multiset "
    "hash-matches DuckDB. Scale: one tiny per-domain aggregate "
    "broadcast into a scan-speed map + explode — the corpus never "
    "shuffles; output size = Sigma copies ~ n_total by construction. "
    "Spark's sequence(1, 0) is the DESCENDING [1, 0] (not empty like "
    "DuckDB's generate_series) — zero-copy docs are filtered BEFORE "
    "the explode on both sides.",
    tags=("sampling", "text", "scale"),
)
def op_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted up/down-sampling to the uniform-domain
    mixture target; emits (doc_id, lang, copy_id)."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(
        F.count("*").alias("n_langs"), F.sum("n_docs").alias("n_total")
    )
    w = counts.join(F.broadcast(tot)).select(
        "lang",
        (
            (F.lit(1.0) / F.col("n_langs"))
            / (F.col("n_docs").cast("double") / F.col("n_total"))
        ).alias("weight"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("text"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    copies = (
        F.floor("weight").cast("bigint")
        + F.when(
            bucket
            < (F.col("weight") - F.floor("weight")) * F.lit(1_000_000.0),
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    assigned = d.join(F.broadcast(w), "lang").select(
        "doc_id", "lang", copies.alias("copies")
    )
    return (
        assigned.filter(F.col("copies") >= 1)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("copies"))).alias(
                "copy_id"
            ),
        )
        .select("doc_id", "lang", F.col("copy_id").cast("bigint"))
    )


#: curriculum shard count — matches the oracle's ntile(16)
_N_CURRICULUM_SHARDS = 16


@query(
    "op_curriculum_shards",
    oracle="""
        WITH toks AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS BIGINT)
                   AS n_tokens
          FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id)
                    AS BIGINT) AS rank,
               CAST(ntile(16) OVER (ORDER BY n_tokens, doc_id)
                    AS INT) AS shard
        FROM toks
    """,
    notes="Curriculum ordering — easy-to-hard (here: short-to-long) "
    "GLOBAL ordering of the corpus into contiguous training shards, "
    "the standard curriculum-learning data layout. The interesting "
    "part is HOW the global rank is computed at scale: a naive "
    "row_number() OVER (ORDER BY ...) with no PARTITION BY plans as "
    "a single-task window — the one-straggler-sorts-the-corpus shape "
    "this repo rejects everywhere. Instead: repartitionByRange on "
    "the total key (sampled range exchange, the same machinery as a "
    "distributed sort), sortWithinPartitions, ONE Arrow pass "
    "assigning partition-local row numbers, a bounded collect of "
    "per-partition COUNTS (n_partitions rows, metadata), and a "
    "broadcast offset map — global_rank = local_rn + offset[pid]. "
    "Plan-asserted: one rangepartitioning Exchange, zero Window "
    "nodes. Shard ids reproduce SQL ntile(16) semantics exactly "
    "(first n%k groups get the extra row) via integer arithmetic, so "
    "the op is oracle-checked end-to-end. Ranks are deterministic "
    "regardless of where the sampled range boundaries land because "
    "the sort key (n_tokens, doc_id) is total.",
    tags=("sampling", "sort", "scale"),
)
def op_curriculum_shards(
    spark: SparkSession, sf_dir: str, _materialize: bool = True
) -> DataFrame:
    """Global curriculum rank + ntile-16 shard per document, without
    a single-task global window.

    ``_materialize=False`` skips the persist and returns the lazy
    plan for inspection (the eager localCheckpoint otherwise replaces
    it with a Scan ExistingRDD — the established plan-test pattern)."""
    import pandas as pd

    d = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), " "), lambda x: x != F.lit("")
    )
    base = d.select(
        "doc_id", F.size(toks).cast("bigint").alias("n_tokens")
    )
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = base.repartitionByRange(
        n_parts, "n_tokens", "doc_id"
    ).sortWithinPartitions("n_tokens", "doc_id")

    def local_ranks(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rn = 0
        for pdf in batches:
            out = pdf.copy()
            out["pid"] = pid
            out["local_rn"] = range(rn + 1, rn + 1 + len(pdf))
            rn += len(pdf)
            yield out

    ranked = ranged.mapInPandas(
        local_ranks,
        schema="doc_id bigint, n_tokens bigint, pid int, "
        "local_rn bigint",
    )
    # two passes over the ranked frame (counts, then the final
    # projection) — persist so the range exchange + sort runs once
    if _materialize:
        ranked = ranked.persist()
    try:
        sizes = {
            r["pid"]: r["c"]
            for r in ranked.groupBy("pid")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        if not sizes:
            # empty corpus: create_map() with zero entries types as
            # map<void,void> and fails analysis on the rank lookup —
            # return the empty frame with the op's schema directly
            # (empty-corpus audit, r11-restart)
            out = ranked.select(
                "doc_id",
                "n_tokens",
                F.lit(None).cast("bigint").alias("rank"),
                F.lit(None).cast("int").alias("shard"),
            )
            return out if not _materialize else out.localCheckpoint(
                eager=True
            )
        n_total = sum(sizes.values())
        offsets, acc = {}, 0
        for pid in sorted(sizes):
            offsets[pid] = acc
            acc += sizes[pid]
        off_map = F.create_map(
            *[
                F.lit(x)
                for pid_off in sorted(offsets.items())
                for x in pid_off
            ]
        )
        rank = (F.col("local_rn") + off_map[F.col("pid")]).alias("rank")
        # SQL ntile(k): first (n % k) tiles hold q+1 rows, the rest q
        k = _N_CURRICULUM_SHARDS
        q_sz, rem = n_total // k, n_total % k
        big = rem * (q_sz + 1)
        if q_sz == 0:
            # fewer rows than tiles: tile i holds exactly row i
            shard_sql = "CAST(rank AS INT)"
        else:
            # integer DIV keeps the tile arithmetic exact at any rank
            shard_sql = (
                f"CAST(CASE WHEN rank <= {big} "
                f"THEN (rank - 1) DIV {q_sz + 1} "
                f"ELSE {rem} + (rank - {big} - 1) DIV {q_sz} "
                f"END + 1 AS INT)"
            )
        out = ranked.select("doc_id", "n_tokens", rank).withColumn(
            "shard", F.expr(shard_sql)
        )
        if not _materialize:
            return out
        return out.localCheckpoint(eager=True)
    finally:
        if _materialize:
            ranked.unpersist()
