"""Streaming execution helpers — run a batch-authored transformation
incrementally (availableNow) and land results in a memory table or an
ORC directory.

This is the reference's conversion loop, streaming-native
(op_stream_orc_sink in SURVEY.md §2.J): files appearing in a source
directory are discovered, transformed, and committed to ORC exactly
once, with progress tracked in a checkpoint instead of the reference's
"did *.orc appear" verification (data_to_orc_converter.sh:556-566).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture (ns timestamps handled the
    same way as catalog.load)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, "
            "event_type string, value double, props string"
        )
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )


def run_available_now(
    result: DataFrame,
    output_mode: str = "complete",
    timeout_sec: int = 120,
) -> DataFrame:
    """Execute a streaming DataFrame with an availableNow trigger into
    a memory sink; returns the sink table as a (batch) DataFrame."""
    spark = result.sparkSession
    name = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)


def stream_to_orc(
    result: DataFrame,
    path: str,
    checkpoint: str | None = None,
    compression: str = "snappy",
    timeout_sec: int = 120,
) -> None:
    """Append-mode streaming ORC sink with exactly-once commits."""
    q = (
        result.writeStream.format("orc")
        .option("path", path)
        .option("compression", compression)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="ckpt_orc_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def stream_to_orc_foreach_batch(
    result: DataFrame,
    path: str,
    checkpoint: str | None = None,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch ORC sink with idempotent per-batch commits.

    The pattern for sinks that need batch-scoped logic (merge, upsert,
    dynamic partition overwrite): each micro-batch lands in its own
    hive partition ``batch_id=N`` via dynamic partition overwrite, so
    a replayed batch overwrites itself instead of duplicating —
    exactly-once without sink-side transactions."""
    import tempfile

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .orc(path)
        )

    q = (
        result.writeStream.foreachBatch(write_batch)
        .option(
            "checkpointLocation",
            checkpoint or tempfile.mkdtemp(prefix="ckpt_fb_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
