"""Streaming sessionization source + transformation (SURVEY.md §2.J).

Builds the watermarked session_window aggregation over a multi-batch
file stream. Split out of batch_windows.py so the streaming equality
test can run the SAME transformation it registers (the op and the test
share this builder — no copy drift).

Scale posture: append-mode session windows are the textbook 100 TB
shape — per micro-batch only that batch's events shuffle on user_id,
open-session state is bounded by the watermark horizon, and a session
is emitted (and its state evicted) exactly once when the watermark
passes its end. The 4-file time-range reshard below is harness
scaffolding that stands in for an in-order log broker; Spark's file
source delivers files oldest-mtime-first, so the explicit utime calls
make delivery order deterministic rather than dependent on how fast
the staging write happened to run.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..scratch import session_scratch

SESSION_GAP = "30 minutes"
N_SHARDS = 4


def shard_events_by_time(
    spark: SparkSession, sf_dir: str, n_shards: int = N_SHARDS
) -> str:
    """Reshard the events fixture into ``n_shards`` contiguous
    time-range parquet files with strictly increasing mtimes, so a
    maxFilesPerTrigger=1 file stream delivers them as in-order
    micro-batches. Returns the source directory."""
    work = session_scratch("sess_stream_")
    src = os.path.join(work, "src")
    staged = os.path.join(work, "staged")
    os.makedirs(src)

    (
        load(spark, sf_dir, "events")
        .select("user_id", "ts")
        .repartitionByRange(n_shards, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(staged)
    )
    # range partition i holds the i-th time quantile; copy into the
    # stream source dir with mtimes that pin the delivery order
    t0 = time.time() - 1000
    for i, part in enumerate(sorted(glob.glob(os.path.join(staged, "part-*")))):
        dst = os.path.join(src, f"shard-{i:02d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (t0 + 10 * i, t0 + 10 * i))
    return src


def sessionized_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over time-sharded events -> zero-delay watermark ->
    30-minute-gap session_window aggregation (append-mode emission:
    one row per FINALIZED session)."""
    src = shard_events_by_time(spark, sf_dir)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    # let callers reclaim the staged shard copies after the stream
    # drains (the staging dir is work/src; its PARENT holds both the
    # shards and the repartition output)
    out._sess_stream_src = src
    return out
