"""Streaming incremental MinHash dedup must converge to the one-shot
batch result: the union of pairs emitted across micro-batches EQUALS
op_dedup_minhash_lsh's pairs on the same corpus — exact set equality,
not recall. This is the property that makes the incremental
decomposition trustworthy: no pair lost at a batch boundary, no pair
double-emitted."""

from __future__ import annotations

from universal_data_to_orc_converter_spark.operators.dedup import (
    op_dedup_minhash_lsh,
)
from universal_data_to_orc_converter_spark.streaming.dedup_stream import (
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
