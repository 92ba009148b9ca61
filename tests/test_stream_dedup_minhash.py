"""Streaming incremental MinHash dedup must converge to the one-shot
batch result: the union of pairs emitted across micro-batches EQUALS
op_dedup_minhash_lsh's pairs on the same corpus — exact set equality,
not recall. This is the property that makes the incremental
decomposition trustworthy: no pair lost at a batch boundary, no pair
double-emitted."""

from __future__ import annotations

import os
import tempfile

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.operators.dedup import (
    op_dedup_minhash_lsh,
)
from universal_data_to_orc_converter_spark.streaming.dedup_stream import (
    dedup_batch,
    op_stream_dedup_minhash,
)

from .conftest import SF_DIR


def test_stream_equals_batch_lsh(spark):
    batch = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in op_dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    stream = [
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in op_stream_dedup_minhash(spark, SF_DIR).collect()
    ]
    assert len(stream) == len(set(stream)), "a pair was emitted twice"
    assert set(stream) == batch
    assert batch, "fixture produced no near-dup pairs; test is vacuous"


def test_replayed_batch_is_idempotent(spark):
    """foreachBatch is at-least-once: a checkpoint-recovered micro-batch
    re-runs with the same batch_id and rows. The per-batch overwrite
    destinations must make the replay a no-op — identical pair set,
    no duplicated signature-store rows (r5 advice)."""

    def read_all(path):
        return (
            spark.read.option("recursiveFileLookup", "true").parquet(path)
            if os.path.isdir(path)
            else None
        )

    work = tempfile.mkdtemp(prefix="sdd_replay_")
    sig_store = os.path.join(work, "sigs")
    pair_store = os.path.join(work, "pairs")
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    half = docs.filter("doc_id % 2 = 0")
    rest = docs.filter("doc_id % 2 = 1")

    dedup_batch(spark, half, sig_store, pair_store, 0)
    dedup_batch(spark, rest, sig_store, pair_store, 1)
    pairs_before = sorted(
        tuple(r) for r in read_all(pair_store).collect()
    )
    n_sigs_before = read_all(sig_store).count()
    assert n_sigs_before == docs.count()

    # crash-recovery: batch 1 replays with the same id and same rows
    dedup_batch(spark, rest, sig_store, pair_store, 1)
    pairs_after = sorted(tuple(r) for r in read_all(pair_store).collect())
    assert pairs_after == pairs_before
    assert read_all(sig_store).count() == n_sigs_before
