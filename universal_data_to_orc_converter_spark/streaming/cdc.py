"""Streaming CDC upsert — foreachBatch merge into a bucket-partitioned
table (SURVEY.md §2.J extension; the streaming completion of
op_latest_by_key and op_cdc_merge).

The reference's conversion loop appends; real ingestion pipelines
UPSERT: each micro-batch carries new versions of some keys, and the
serving table must converge to latest-write-wins. Without a
transactional table format (Delta/Iceberg are absent from this
container — MIGRATION.md), the scale-correct merge is:

1. partition the target directory by ``bucket = pmod(hash(key), N)``;
2. per micro-batch, reduce the batch to latest-per-key, find its
   touched buckets (≤ N values — a bounded driver list, never data);
3. read ONLY those buckets back (partition pruning on the dir layout),
   union with the batch, keep latest per key;
4. rewrite JUST the touched buckets via dynamic partition overwrite.

Per-batch cost is proportional to the touched fraction of the table,
not the table size — at 100 TB with N=4096 buckets a batch touching 1%
of keys rewrites ~1% of files. A lakehouse MERGE INTO would add
file-level (not bucket-level) pruning and transactional concurrency;
this is the honest fallback with the same asymptotics. The
staging-then-flip double write exists because Spark (correctly)
refuses to overwrite a path that appears as a scan in the same plan;
MERGE-capable formats fold those two writes into one commit.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..scratch import session_scratch
from .runner import stream_partitions

N_BUCKETS = 16


def _latest_per_key(df: DataFrame) -> DataFrame:
    """Last write wins: one row per user_id, ts then event_id tiebreak
    (same deterministic rule as op_latest_by_key)."""
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    )
    return df.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn")


#: change-row payload columns carried through the merge
CDC_COLS = ("user_id", "ts", "event_id", "event_type", "value")


def cdc_upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    target_dir: str,
    cols: tuple[str, ...] = CDC_COLS,
) -> None:
    """Merge one micro-batch of change rows into the bucket-partitioned
    target. Idempotent: replaying a batch converges to the same state
    (latest-per-key is a set fixpoint, and dynamic overwrite replaces
    whole buckets). Tombstone rows (if the payload carries a delete
    flag) are merged like any other version — they must SHADOW older
    upserts inside the bucket rather than being dropped at merge time;
    the serving read filters them (see op_stream_cdc_delete)."""
    latest = _latest_per_key(batch_df.select(*cols)).withColumn(
        "bucket", F.pmod(F.hash("user_id"), F.lit(N_BUCKETS))
    )

    # touched-bucket list: bounded by N_BUCKETS, a metadata-sized
    # driver collect (NOT a data-plane collect)
    touched = [r.bucket for r in latest.select("bucket").distinct().collect()]

    # An empty micro-batch (availableNow checkpoint recovery can
    # redeliver one) touches nothing: writing it through staging would
    # produce a partfile-less directory that read.parquet cannot infer
    # a schema from. State is already correct — skip the merge.
    if not touched:
        return

    if os.path.isdir(target_dir) and touched:
        current = spark.read.parquet(target_dir).filter(
            F.col("bucket").isin(touched)
        )
        merged = _latest_per_key(current.unionByName(latest))
    else:
        merged = latest

    # stage, then dynamic-overwrite only the touched buckets
    staging = tempfile.mkdtemp(prefix="cdc_staging_")
    try:
        merged.write.mode("overwrite").partitionBy("bucket").parquet(staging)
        (
            spark.read.parquet(staging)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(target_dir)
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


@query(
    "op_stream_cdc_upsert",
    oracle="""
        SELECT user_id, ts AS last_ts, event_type AS last_type,
               value AS last_value
        FROM (
          SELECT user_id, ts, event_type, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        )
        WHERE rn = 1
    """,
    notes="True streaming CDC: the events fixture is re-sharded into 4 "
    "files and streamed with maxFilesPerTrigger=1, so foreachBatch "
    "runs 4 genuine incremental merges into a bucket-partitioned "
    "parquet target (dynamic partition overwrite rewrites only "
    "touched buckets). The final table must equal the batch "
    "latest-per-key oracle — convergence of the incremental merge, "
    "not just one-shot agreement. Module docstring has the 100 TB "
    "cost model.",
    tags=("streaming", "io", "dedup", "scale"),
)
def op_stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow CDC stream -> per-batch bucket merge -> snapshot."""
    from ..catalog import load

    work = session_scratch("cdc_work_")
    src_dir = os.path.join(work, "src")
    target_dir = os.path.join(work, "target")

    # re-shard the fixture so availableNow delivers MULTIPLE batches
    events = load(spark, sf_dir, "events")
    if events.isEmpty():
        # no change stream -> no merges ever run and the target is
        # never created; the snapshot of nothing is an empty frame
        # (empty-corpus audit, r11-restart)
        return events.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    events.repartition(4).write.parquet(src_dir)

    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)

    with stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda batch_df, _id: cdc_upsert_batch(
                    spark, batch_df, target_dir
                )
            )
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(180)

    return spark.read.parquet(target_dir).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


@query(
    "op_stream_cdc_delete",
    oracle="""
        SELECT user_id, ts AS last_ts, value AS last_value
        FROM (
          SELECT user_id, ts, event_id, value,
                 (event_id % 17 = 0) AS is_delete,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        )
        WHERE rn = 1 AND NOT is_delete
    """,
    notes="CDC upsert WITH tombstones: rows where event_id % 17 = 0 "
    "are deletes. The subtlety this op pins down: a tombstone must be "
    "MERGED (so it shadows older upserts of its key inside the "
    "bucket) and only filtered at serving time — dropping deletes at "
    "merge time would resurrect the previous version. A key whose "
    "LATEST version is a tombstone is absent from the snapshot; a "
    "key deleted then re-upserted reappears. Same 4-micro-batch "
    "incremental execution and touched-bucket-only rewrite as "
    "op_stream_cdc_upsert.",
    tags=("streaming", "io", "dedup", "scale"),
)
def op_stream_cdc_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow CDC stream with delete tombstones -> snapshot."""
    from ..catalog import load

    work = session_scratch("cdcdel_work_")
    src_dir = os.path.join(work, "src")
    target_dir = os.path.join(work, "target")

    events = load(spark, sf_dir, "events").withColumn(
        "is_delete", F.col("event_id") % 17 == 0
    )
    if events.isEmpty():
        # same degradation as op_stream_cdc_upsert (empty-corpus
        # audit, r11-restart)
        return events.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    events.repartition(4).write.parquet(src_dir)

    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)

    cols = CDC_COLS + ("is_delete",)
    with stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda batch_df, _id: cdc_upsert_batch(
                    spark, batch_df, target_dir, cols=cols
                )
            )
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(180)

    return (
        spark.read.parquet(target_dir)
        .filter(~F.col("is_delete"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "op_stream_update_counts",
    oracle="""
        SELECT event_type, COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
    notes="UPDATE output mode semantics (the third mode — every other "
    "streaming op here runs complete or append): a grouped count over "
    "a 4-micro-batch stream emits, per batch, only the groups whose "
    "counts CHANGED. The memory sink therefore accumulates multiple "
    "versions per key; the serving read takes the last version of "
    "each group and must equal the batch count — which also verifies "
    "that the intermediate emissions were monotone per-key versions, "
    "not duplicates (a duplicate-emitting bug would leave the right "
    "final row but the take-latest would be ambiguous; the "
    "batch_seq tiebreak pins it).",
    tags=("streaming",),
)
def op_stream_update_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped counts under update output mode, multi-batch; serve the
    latest version per group."""
    from ..catalog import load

    work = session_scratch("upd_work_")
    src_dir = os.path.join(work, "src")
    events = load(spark, sf_dir, "events")
    events.repartition(4).write.parquet(src_dir)

    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)

    counts = stream.groupBy("event_type").agg(F.count("*").alias("n_events"))

    # foreachBatch stamps each emission with its batch id so the
    # serving read can take the latest version deterministically
    out_dir = os.path.join(work, "out")

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_seq", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    with stream_partitions(spark):
        q = (
            counts.writeStream.outputMode("update")
            .foreachBatch(emit)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(180)

    versions = spark.read.parquet(out_dir)
    rn = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.desc("batch_seq"))
    )
    return (
        versions.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("event_type", "n_events")
    )
