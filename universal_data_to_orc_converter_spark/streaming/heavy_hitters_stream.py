"""Streaming Misra-Gries heavy hitters — per-micro-batch mergeable
summaries via foreachBatch (SURVEY.md §2.J × the maintenance family;
r9-backlog stretch (c) from TODO_r9).

The mergeable-summaries property (Agarwal et al.) is exactly what
makes MG streamable with NO per-key state store: each micro-batch
folds into a <= k-counter summary (the same ``_mg_partials`` Arrow
kernel as batch ``op_heavy_hitters_maintain`` — identical trim rule,
so streaming and batch summaries obey one algebra), the summary is
written to a deterministic per-batch ``b_<batch_id>`` directory in
overwrite mode (replay-idempotent under foreachBatch's at-least-once
contract, the op_stream_dedup_minhash layout), and serving is a
keywise counter sum + one published trim over the accumulated
summaries.

100 TB cost model: per batch the corpus rows are read ONCE and reduced
map-side to O(partitions * k) counter rows; the accumulated store
grows by <= k rows per batch *independent of the key universe*, and
the serve-time merge touches only summaries — never raw history. This
is the top-k analogue of op_incremental_agg_maintain's economics.

Convergence contract: the fixture regime is EXACT (derived key
universe ~5003 << k=8192, so no trim ever fires), hence the drained
stream's top-10 must EQUAL both the batch op's result and the plain
GROUP BY oracle — a full DuckDB oracle, not rows-only, which is rare
for a streaming op and is the point of pinning the exact regime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.maintenance import (
    _MG_K,
    HIST_QUANTILE_ORACLE,
    MG_KEY_SQL,
    _mg_partials,
    mg_key_expr,
    mg_merge_topk,
)
from ..registry import query
from ..scratch import session_scratch
from .runner import stream_partitions


def _drain_foreachbatch(spark, staged, work, batch_fn, op_name):
    """Shared micro-batch harness for the summary-maintenance streams
    (review finding r8 — it existed as two verbatim copies): stage the
    frame as a 4-file parquet stream source under ``work``, run it
    through foreachBatch(batch_fn) with availableNow, raise on an
    un-drained stream (the r7-ADVICE TimeoutError contract)."""
    src = os.path.join(work, "src")
    staged.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    with stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"{op_name}: stream did not drain in 300s")


def mg_summary_batch(
    batch_df: DataFrame, store: str, batch_id: int, k: int = _MG_K
) -> None:
    """Fold one micro-batch into a <= k-counter MG summary at a
    deterministic per-batch path (overwrite => replay-idempotent)."""
    _mg_partials(batch_df.select(mg_key_expr()), k).write.mode(
        "overwrite"
    ).parquet(os.path.join(store, f"b_{batch_id}"))


@query(
    "op_stream_heavy_hitters",
    oracle=f"""
        WITH keyed AS (
          SELECT {MG_KEY_SQL} AS k
          FROM events
        )
        SELECT k, CAST(COUNT(*) AS BIGINT) AS est_count
        FROM keyed
        GROUP BY k
        ORDER BY est_count DESC, k
        LIMIT 10
    """,
    notes="STREAMING Misra-Gries top-k (module docstring has design + "
    "100 TB cost model): events resharded into 4 files, streamed "
    "maxFilesPerTrigger=1; each foreachBatch reduces the batch to a "
    "<= k-counter summary with the IDENTICAL Arrow kernel, key spec "
    "(mg_key_expr — one spec, both ops, both oracles), and trim rule "
    "as batch op_heavy_hitters_maintain; per-batch summaries land at "
    "deterministic b_<id> paths in overwrite mode (replay-idempotent "
    "under at-least-once foreachBatch). Serve = keywise sum + the "
    "published trim + top-10. FULL DuckDB oracle (exceptional for a "
    "streaming op): the pinned exact regime (universe ~5003 << "
    "k=8192) means no trim fires on any fixture scale, so the "
    "drained merge equals the plain GROUP BY — and "
    "tests/test_stream_heavy_hitters.py additionally asserts "
    "equality against the batch op. State economics: <= k counter "
    "rows per batch, zero raw history retained.",
    tags=("streaming", "agg", "scale", "maintenance"),
)
def op_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow event stream -> per-batch MG summaries ->
    mergeable-summaries serve -> exact top-10 in the pinned regime."""
    from ..catalog import load

    work = session_scratch("shh_")
    store = os.path.join(work, "summaries")
    _drain_foreachbatch(
        spark,
        load(spark, sf_dir, "events").select("event_id"),
        work,
        lambda bdf, bid: mg_summary_batch(bdf, store, bid),
        "op_stream_heavy_hitters",
    )
    partials = spark.read.option("recursiveFileLookup", "true").parquet(
        store
    )
    # Eager localCheckpoint (ADVICE r8): the serve plan reads parquet
    # out of session_scratch; checkpointing the tiny top-10 result
    # (like batch op_heavy_hitters_maintain) makes the returned frame
    # independent of the scratch dir, so a host calling
    # scratch.reclaim_all() before its first action can't break it.
    return mg_merge_topk(partials, _MG_K, 10).localCheckpoint(eager=True)


def hist_batch(batch_df: DataFrame, store: str, batch_id: int) -> None:
    """Fold one micro-batch into histogram-bin partial state at a
    deterministic per-batch path (overwrite => replay-idempotent)."""
    from ..operators.maintenance import hist_bins

    hist_bins(batch_df).write.mode("overwrite").parquet(
        os.path.join(store, f"b_{batch_id}")
    )


@query(
    "op_stream_quantiles",
    oracle=HIST_QUANTILE_ORACLE,
    notes="STREAMING quantile maintenance — the histogram sibling of "
    "op_stream_heavy_hitters, completing the streaming-maintenance "
    "family (top-k sketch + quantile sketch, both via foreachBatch): "
    "each micro-batch reduces to per-(event_type, unit bin) counts "
    "with the SAME hist_bins spec as batch "
    "op_quantile_histogram_maintain (shared function, plus a "
    "batch-equality test), written to replay-idempotent b_<id> "
    "paths; serving merges bin counts (histogram addition IS the "
    "merge algebra) and reads p50/p90/p99 with all-integer rank "
    "comparisons — so the drained stream carries a FULL DuckDB "
    "oracle, like the MG stream. State: |types| x |occupied bins| "
    "rows per batch, bounded by the value range, independent of row "
    "count; no per-key state store, no watermark needed — the "
    "summary is the state.",
    tags=("streaming", "agg", "scale", "maintenance"),
)
def op_stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow event stream -> per-batch histogram partials ->
    merged state -> exact p50/p90/p99 lower bin edges per type."""
    from ..catalog import load
    from ..operators.maintenance import hist_serve

    work = session_scratch("shq_")
    store = os.path.join(work, "summaries")
    _drain_foreachbatch(
        spark,
        load(spark, sf_dir, "events").select("event_type", "value"),
        work,
        lambda bdf, bid: hist_batch(bdf, store, bid),
        "op_stream_quantiles",
    )
    merged = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(store)
        .groupBy("event_type", "bin")
        .agg(F.sum("c").alias("c"))
    )
    # Eager localCheckpoint: same scratch-independence contract as
    # op_stream_heavy_hitters above (ADVICE r8) — the served quantile
    # frame is a handful of rows, so the checkpoint is free.
    return hist_serve(merged).localCheckpoint(eager=True)
