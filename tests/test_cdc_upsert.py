"""Streaming CDC upsert — properties of the per-batch bucket merge
that the oracle comparison alone doesn't pin down: convergence under
out-of-order delivery, replay idempotency (the foreachBatch
exactly-once contract), and bucket-level write isolation (the 100 TB
cost model: a batch only rewrites buckets it touches)."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.streaming.cdc import (
    N_BUCKETS,
    cdc_upsert_batch,
)

SF = "/root/testdata/sf0.001"


def _snapshot(spark, target):
    return sorted(
        spark.read.parquet(target)
        .select("user_id", "ts", "event_id")
        .collect()
    )


def _expected(events):
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    )
    return sorted(
        events.withColumn("rn", rn)
        .filter("rn = 1")
        .select("user_id", "ts", "event_id")
        .collect()
    )


def test_out_of_order_batches_converge_and_replay_is_idempotent(spark):
    events = load(spark, SF, "events")
    target = tempfile.mkdtemp(prefix="cdc_t_") + "/tbl"

    # deliver NEWEST slice first: latest-write-wins must still hold
    # because the merge compares (ts, event_id), not arrival order
    slices = [
        events.filter(F.col("event_id") % 3 == k) for k in (2, 1, 0)
    ]
    for s in slices:
        cdc_upsert_batch(spark, s, target)
    assert _snapshot(spark, target) == _expected(events)

    # replaying the final batch (foreachBatch redelivery after a
    # checkpoint-recovery) must not change the state
    before = _snapshot(spark, target)
    cdc_upsert_batch(spark, slices[-1], target)
    assert _snapshot(spark, target) == before


def test_batch_rewrites_only_touched_buckets(spark):
    events = load(spark, SF, "events")
    target = tempfile.mkdtemp(prefix="cdc_b_") + "/tbl"
    cdc_upsert_batch(spark, events, target)

    def bucket_mtimes():
        out = {}
        for b in range(N_BUCKETS):
            files = glob.glob(os.path.join(target, f"bucket={b}", "*.parquet"))
            if files:
                out[b] = max(os.path.getmtime(f) for f in files)
        return out

    before = bucket_mtimes()
    one_user = events.orderBy("user_id").limit(1)
    touched = one_user.select(
        F.pmod(F.hash("user_id"), F.lit(N_BUCKETS)).alias("b")
    ).collect()[0].b
    cdc_upsert_batch(spark, one_user, target)
    after = bucket_mtimes()

    for b in before:
        if b == touched:
            assert after[b] >= before[b]
        else:
            assert after[b] == before[b], (
                f"bucket {b} was rewritten by a batch that never "
                "touched it — dynamic overwrite is leaking"
            )
