"""Streaming incremental MinHash near-duplicate detection — the
online admission gate a training-data ingest pipeline runs as
documents ARRIVE, instead of re-running corpus-wide LSH nightly
(SURVEY.md §2.J × §2.I composite, r5).

Per micro-batch the foreachBatch merge:

1. computes the arriving documents' MinHash signatures with the SAME
   Arrow-batched kernel as batch ``op_dedup_minhash_lsh``
   (``make_minhash_sig_batches`` — identical constants, so streaming
   and batch signatures are bit-identical);
2. joins the new band triples against the accumulated signature
   store's bands PLUS the batch's own (so intra-batch pairs are found
   too), exact-Jaccard-verifies the candidates, and writes the
   surviving pairs to the result store;
3. writes the new signatures to the signature store.

Every near-dup pair is emitted exactly once — at the micro-batch
where its LATER member arrives (earlier-vs-history pairs can't recur,
and intra-batch pairs are deduplicated before the write). The
exactly-once contract survives checkpoint recovery: both stores are
laid out as deterministic per-batch ``b_<batch_id>`` subdirectories
written in overwrite mode, so foreachBatch's at-least-once replay
overwrites its own prior attempt instead of appending a second copy.

100 TB cost model: per batch, the work is |new| signature computations
plus a band-bucket join of |new| triples against the store — never
history × history. The signature store grows with the corpus, but the
join probes it by band hash (an equi-join Spark hashes on the band
side), so per-batch cost tracks |new| × collision rate, the same
asymptotics as the batch op's candidate stage restricted to the new
rows. The store would be bucket-stored on band_hash in production so
the probe side prunes to matching buckets; the parquet-append store
here keeps the fixture honest without a table format — exactly the
trade the CDC module documents.

Convergence contract: after the stream drains, the union of all
emitted pairs must EQUAL the one-shot batch ``op_dedup_minhash_lsh``
result — asserted in tests/test_stream_dedup_minhash.py (equality,
not recall).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import make_minhash_sig_batches
from ..registry import query
from ..scratch import session_scratch
from .runner import stream_partitions

_SIG_SCHEMA = "doc_id bigint, h array<bigint>, bands array<bigint>"


def _has_parquet(root: str) -> bool:
    for _dir, _sub, names in os.walk(root):
        if any(n.endswith(".parquet") for n in names):
            return True
    return False


def dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    sig_store: str,
    pair_store: str,
    batch_id: int,
) -> None:
    """Process one micro-batch of documents: emit near-dup pairs vs
    history + batch, then add the batch's signatures to the store.

    foreachBatch is at-least-once: a checkpoint-recovered micro-batch
    REPLAYS with the same batch_id and (file source) the same rows.
    Both outputs therefore go to deterministic per-batch
    subdirectories (``b_<batch_id>``) in OVERWRITE mode, so a replay
    lands on top of its own previous attempt instead of double-
    emitting pairs and duplicating signature rows (r5 advice) — the
    same deterministic-destination idempotence as
    ``ingest_new_files`` and the event-dump streaming sink."""
    sig_batches = make_minhash_sig_batches()
    new_sigs = (
        batch_df.select("doc_id", "text")
        .mapInPandas(sig_batches, _SIG_SCHEMA)
        .localCheckpoint()  # one signature pass per batch, reused 4×
    )
    if os.path.isdir(sig_store) and _has_parquet(sig_store):
        known = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(sig_store)
            # a replayed batch must dedup against HISTORY only, not
            # its own crashed attempt's signatures
            .filter(~F.input_file_name().contains(f"/b_{batch_id}/"))
        )
    else:
        known = spark.createDataFrame([], _SIG_SCHEMA)
    all_sigs = known.unionByName(new_sigs)

    nb = new_sigs.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_hash")
    )
    ab = all_sigs.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_hash")
    )
    a, b = nb.alias("a"), ab.alias("b")
    # new × (history + batch): every candidate touches >=1 new doc, so
    # a pair can only surface in the batch where its later member
    # arrives — exactly-once emission without a global dedup pass
    cand = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(
        F.least("a.doc_id", "b.doc_id").alias("doc_a"),
        F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
    )
    sa = all_sigs.select(F.col("doc_id").alias("doc_a"), F.col("h").alias("s_a"))
    sb = all_sigs.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("s_b"))
    jac = F.size(F.array_intersect("s_a", "s_b")).cast("double") / F.size(
        F.array_union("s_a", "s_b")
    )
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.7)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs.write.mode("overwrite").parquet(
        os.path.join(pair_store, f"b_{batch_id}")
    )
    new_sigs.write.mode("overwrite").parquet(
        os.path.join(sig_store, f"b_{batch_id}")
    )


@query(
    "op_stream_dedup_minhash",
    oracle=None,
    notes="Streaming incremental MinHash near-dup gate (module "
    "docstring has the design + 100 TB cost model): the documents "
    "fixture is re-sharded into 4 files and streamed "
    "maxFilesPerTrigger=1; each foreachBatch computes arriving "
    "signatures with the IDENTICAL Arrow kernel as batch "
    "op_dedup_minhash_lsh, band-joins them against the accumulated "
    "store (+ the batch itself), exact-Jaccard-verifies, and appends "
    "pairs — each pair emitted exactly once, at its later member's "
    "arrival batch. rows-only (MinHash has no SQL oracle, same escape "
    "hatch as the batch op); the STRONGER check is "
    "tests/test_stream_dedup_minhash.py: the drained stream's pair "
    "set must EQUAL the one-shot batch LSH result exactly, proving "
    "the incremental decomposition is lossless.",
    tags=("streaming", "dedup", "approx", "scale"),
)
def op_stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow document stream -> per-batch incremental LSH ->
    accumulated near-dup pairs."""
    from ..catalog import load

    work = session_scratch("sdd_")
    src = os.path.join(work, "src")
    sig_store = os.path.join(work, "sigs")
    pair_store = os.path.join(work, "pairs")

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: dedup_batch(
                    spark, bdf, sig_store, pair_store, bid
                )
            )
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(300)

    if not (os.path.isdir(pair_store) and _has_parquet(pair_store)):
        return spark.createDataFrame(
            [], "doc_a bigint, doc_b bigint, jaccard double"
        )
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(pair_store)
        .select("doc_a", "doc_b", "jaccard")
    )
