"""Streaming equivalence + watermark semantics (SURVEY.md §5.4).

Every batch windowed aggregation must produce identical results when
executed incrementally (availableNow); late-data handling is tested
separately with crafted timestamps through a rate-controlled two-file
source so the watermark actually advances between micro-batches."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime as DT

from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.sinks.orc import read_orc
from universal_data_to_orc_converter_spark.streaming.batch_windows import (
    tumbling_agg,
)
from universal_data_to_orc_converter_spark.streaming.runner import (
    read_events_stream,
    run_available_now,
    stream_to_orc,
)

from .conftest import SF_DIR


def as_sets(df, cols):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_stream_tumbling_equals_batch(spark):
    batch = tumbling_agg(load(spark, SF_DIR, "events"))
    stream = run_available_now(tumbling_agg(read_events_stream(spark, SF_DIR)))
    cols = ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    assert as_sets(batch, cols) == as_sets(stream, cols)


def test_stream_session_window_equals_batch(spark):
    def sessions(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    batch = sessions(load(spark, SF_DIR, "events"))
    stream = run_available_now(
        sessions(read_events_stream(spark, SF_DIR).withWatermark("ts", "1 hour")),
        output_mode="append",
    )
    cols = ["user_id", "session_start", "session_end", "n_events"]
    # append mode emits only watermark-finalized sessions; every emitted
    # session must exist in the batch result, and nearly all sessions
    # are past the final watermark for a bounded historical input.
    b, s = as_sets(batch, cols), as_sets(stream, cols)
    assert s <= b
    assert len(s) >= 0.9 * len(b)


def test_watermark_drops_late_events(spark):
    """10:10 arrives in a micro-batch after the watermark passed 11:00
    → its 10:00 window is final and the late row must not resurrect
    it. Uses a live micro-batch stream with the late file written only
    after the first batch commits (availableNow folds all files into
    one batch, so the watermark would never advance in between)."""
    import time
    import uuid

    tmpdir = tempfile.mkdtemp(prefix="late_")
    schema = "event_id long, ts timestamp, user_id long, value double"
    on_time = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 10, 5), 1, 1.0), (2, DT(2024, 1, 1, 12, 0), 1, 1.0)],
        schema,
    )
    on_time.coalesce(1).write.parquet(os.path.join(tmpdir, "f1"))

    stream = (
        spark.readStream.schema(schema)
        .parquet(tmpdir + "/*")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_late_"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:

        def wait_for_watermark(min_wm: str, timeout: float = 60.0) -> None:
            deadline = time.time() + timeout
            while time.time() < deadline:
                p = q.lastProgress
                if p and p["eventTime"].get("watermark", "1970") >= min_wm:
                    return
                time.sleep(0.3)
            raise AssertionError(f"watermark never reached {min_wm}")

        wait_for_watermark("2024-01-01T11:00:00")
        late = spark.createDataFrame(
            [
                (3, DT(2024, 1, 1, 10, 10), 1, 1.0),  # < 11:00 ⇒ dropped
                (4, DT(2024, 1, 1, 13, 30), 1, 1.0),  # advances watermark
            ],
            schema,
        )
        late.coalesce(1).write.parquet(os.path.join(tmpdir, "f2"))
        wait_for_watermark("2024-01-01T12:30:00")
    finally:
        q.stop()
    out = spark.table(name)
    got = {(r["ws"].isoformat(), r["n"]) for r in out.collect()}
    # the 10:00 window closed with exactly 1 event; the late event_id=3
    # (also 10:00-11:00) was dropped, never re-emitted; the 12:00
    # window is NOT emitted — its end (13:00) is still ahead of the
    # final watermark (12:30), so it remains open state
    assert ("2024-01-01T10:00:00", 1) in got
    assert ("2024-01-01T10:00:00", 2) not in got
    assert not any(ws == "2024-01-01T12:00:00" for ws, _ in got)


def test_stream_dedup_with_watermark(spark):
    """op_stream_dedup: duplicate event_ids across micro-batches are
    dropped by stateful dedup under a watermark."""
    tmpdir = tempfile.mkdtemp(prefix="dup_")
    schema = "event_id long, ts timestamp, user_id long, value double"
    b1 = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 10, 0), 1, 1.0), (2, DT(2024, 1, 1, 10, 1), 1, 1.0)],
        schema,
    )
    b2 = spark.createDataFrame(
        [(2, DT(2024, 1, 1, 10, 1), 1, 1.0), (3, DT(2024, 1, 1, 10, 2), 1, 1.0)],
        schema,
    )
    b1.coalesce(1).write.parquet(os.path.join(tmpdir, "b=1"))
    b2.coalesce(1).write.parquet(os.path.join(tmpdir, "b=2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmpdir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
    )
    out = run_available_now(stream, output_mode="append")
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]


def test_stream_orc_sink_roundtrip(spark):
    """The reference's conversion loop as a stream: source parquet →
    streaming ORC sink → read back equals the batch table."""
    outdir = tempfile.mkdtemp(prefix="orc_sink_")
    stream = read_events_stream(spark, SF_DIR)
    stream_to_orc(stream, os.path.join(outdir, "events"))
    back = read_orc(spark, os.path.join(outdir, "events"))
    batch = load(spark, SF_DIR, "events")
    assert back.count() == batch.count()
    assert as_sets(back, ["event_id"]) == as_sets(batch, ["event_id"])


def test_stream_orc_sink_exactly_once_on_restart(spark):
    """Re-running with the same checkpoint must not duplicate data."""
    outdir = tempfile.mkdtemp(prefix="orc_once_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_once_")
    path = os.path.join(outdir, "events")
    stream_to_orc(read_events_stream(spark, SF_DIR), path, checkpoint=ckpt)
    n1 = read_orc(spark, path).count()
    # second run, same checkpoint: no new source files ⇒ no new rows
    stream_to_orc(read_events_stream(spark, SF_DIR), path, checkpoint=ckpt)
    n2 = read_orc(spark, path).count()
    assert n1 == n2 == load(spark, SF_DIR, "events").count()


def test_foreach_batch_orc_sink_idempotent(spark):
    """foreachBatch with dynamic partition overwrite: replaying the
    same batch (fresh checkpoint, same data) rewrites its partition
    instead of duplicating rows."""
    import tempfile

    from universal_data_to_orc_converter_spark.streaming.runner import (
        stream_to_orc_foreach_batch,
    )

    outdir = tempfile.mkdtemp(prefix="fb_orc_")
    path = os.path.join(outdir, "events")
    n_src = load(spark, SF_DIR, "events").count()
    stream_to_orc_foreach_batch(read_events_stream(spark, SF_DIR), path)
    assert read_orc(spark, path).count() == n_src
    # replay with a NEW checkpoint (simulates a re-run after checkpoint
    # loss — the classic duplication hazard): same batch_id partition
    # is overwritten, not appended
    stream_to_orc_foreach_batch(read_events_stream(spark, SF_DIR), path)
    assert read_orc(spark, path).count() == n_src


def test_stateful_processing_time_timeout_evicts_idle_users(spark):
    """A user absent from the stream past the timeout is emitted once
    as 'evicted' and their state removed (TODO_r2 item 4)."""
    import time
    import uuid

    from universal_data_to_orc_converter_spark.streaming.stateful import (
        user_presence_with_timeout,
    )

    tmpdir = tempfile.mkdtemp(prefix="sto_")
    schema = "event_id long, ts timestamp, user_id long, value double"
    b1 = spark.createDataFrame(
        [(1, DT(2024, 1, 1, 10, 0), 1, 1.0), (2, DT(2024, 1, 1, 10, 0), 2, 1.0)],
        schema,
    )
    b1.coalesce(1).write.parquet(os.path.join(tmpdir, "f1"))
    stream = (
        spark.readStream.schema(schema).parquet(tmpdir + "/*")
    )
    out = user_presence_with_timeout(stream, timeout_ms=8000)
    name = f"sto_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_sto_"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # user 1 goes idle and times out; user 2 is refreshed REPEATEDLY
        # from inside the polling loop. A single up-front refresh was a
        # real flake (observed in a full-suite run): if the host stalls
        # batch scheduling past the 8 s timeout before the one refresh
        # batch processes, user 2 is evicted, its counter resets to 1,
        # and n_events can never reach 2. Continuous refreshes make the
        # count-crossing inevitable under ANY scheduling: either two
        # refresh batches process within the timeout (state carries,
        # count increments), or queued refresh files pile into one
        # batch and the count jumps by several at once.
        # Cap refresh files (ADVICE r8): unbounded writes would pile up
        # hundreds of tiny files on a worst-case stall, and the growing
        # source listing itself slows every micro-batch, compounding the
        # stall it guards against. 80 refreshes over ≥40 s is far beyond
        # any observed scheduling gap; past the cap we keep polling.
        deadline = time.time() + 180
        evicted, n2_max, i = set(), 0, 0
        while time.time() < deadline:
            if i < 80:
                spark.createDataFrame(
                    [(100 + i, DT(2024, 1, 1, 10, 1), 2, 1.0)], schema
                ).coalesce(1).write.parquet(os.path.join(tmpdir, f"f2_{i}"))
                i += 1
            rows = spark.table(name).collect()
            evicted = {
                r["user_id"] for r in rows if r["status"] == "evicted"
            }
            n2_max = max(
                [r["n_events"] for r in rows if r["user_id"] == 2], default=0
            )
            if 1 in evicted and n2_max >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert 1 in evicted, "idle user 1 should have been evicted by timeout"
    assert n2_max >= 2, "user 2's refresh batch should have counted"


def test_stream_interval_join_equals_batch(spark):
    """True stream-stream join: two watermarked readStream sources,
    time-range predicate, append mode — inner interval joins emit every
    match for a bounded input, so the result must equal batch."""
    from universal_data_to_orc_converter_spark.streaming.batch_windows import (
        interval_join,
    )

    e = load(spark, SF_DIR, "events")
    batch = interval_join(
        e.filter(F.col("event_type") == "view"),
        e.filter(F.col("event_type") == "purchase"),
    )
    sv = (
        read_events_stream(spark, SF_DIR)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "1 hour")
    )
    sp = (
        read_events_stream(spark, SF_DIR)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
    )
    stream = run_available_now(interval_join(sv, sp), output_mode="append")
    cols = ["user_id", "view_id", "purchase_id", "view_ts", "purchase_ts"]
    assert as_sets(batch, cols) == as_sets(stream, cols)


def test_heartbeat_join_cleans_staging_and_checkpoints(
    spark, tmp_path, monkeypatch
):
    """The outer-join heartbeat machinery stages a corpus-sized copy of
    events.parquet plus a checkpoint dir per invocation; both must be
    reclaimed once the stream drains (r6 advice — three ops each leaked
    one staged corpus per call). The result must stay collectable AFTER
    cleanup (memory sink is driver-resident, not file-backed).

    Scratch root isolated to tmp_path so a concurrent repo process
    (e.g. a scale audit running alongside pytest) can't create its own
    ssoj_*/ckpt_* dirs between the before/after globs (the same
    spurious-failure mode observed r13 on the mg_state test)."""
    import glob
    import tempfile

    from universal_data_to_orc_converter_spark.registry import QUERIES

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    tmp = tempfile.gettempdir()

    def live(pattern):
        return {p for p in glob.glob(os.path.join(tmp, pattern))}

    before_stage, before_ckpt = live("ssoj_*"), live("ckpt_*")
    out = QUERIES["op_stream_interval_join_outer"].fn(spark, SF_DIR)
    rows = out.count()
    assert rows > 0
    assert live("ssoj_*") == before_stage, "staged events copy leaked"
    assert live("ckpt_*") == before_ckpt, "checkpoint dir leaked"


def test_tws_stateful_matches_legacy_api(spark):
    """transformWithStateInPandas (Spark 4 stateful API) must produce
    the same per-user accumulator rows as the applyInPandasWithState
    implementation. Requires google.protobuf (TWS driver-worker dep)
    — absent from this container, so this skips here and activates
    in any env that ships it."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")

    from universal_data_to_orc_converter_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
    )
    from universal_data_to_orc_converter_spark.streaming.stateful import (
        user_activity_stateful,
        user_activity_tws,
    )

    from .conftest import SF_SMOKE

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        legacy = run_available_now(
            user_activity_stateful(read_events_stream(spark, SF_SMOKE)),
            output_mode="update",
        )
        tws = run_available_now(
            user_activity_tws(read_events_stream(spark, SF_SMOKE)),
            output_mode="update",
        )
        assert sorted(map(tuple, legacy.collect())) == sorted(
            map(tuple, tws.collect())
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_sessionize_equals_batch_below_watermark(spark):
    """The multi-batch append-mode session stream must emit exactly the
    batch session_window result restricted to sessions the final
    watermark finalized (end <= ms-truncated max event time) — one row
    per session, no duplicates, none missing, Spark-vs-Spark (the
    DuckDB oracle covers the same contract cross-engine)."""
    from universal_data_to_orc_converter_spark.streaming.runner import (
        run_available_now,
    )
    from universal_data_to_orc_converter_spark.streaming.sessionize_stream import (
        SESSION_GAP,
        sessionized_stream,
    )

    streamed = run_available_now(
        sessionized_stream(spark, SF_DIR), output_mode="append"
    )

    ev = load(spark, SF_DIR, "events").select("user_id", "ts")
    wm = ev.agg(
        F.date_trunc("millisecond", F.max("ts")).alias("wm")
    ).collect()[0].wm
    # NB: do NOT filter on w.end — Catalyst pushes a session_window.end
    # predicate below MergingSessions into the scan (ts + gap <= wm),
    # which removes events BEFORE merging and splits straddling
    # sessions. Filtering on the agg output max(ts) is not pushable.
    batch = (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("last_ts"))
        .filter(
            F.col("last_ts") + F.expr("INTERVAL 30 MINUTES") <= F.lit(wm)
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    s_rows = sorted(map(tuple, streamed.collect()))
    b_rows = sorted(map(tuple, batch.collect()))
    assert len(s_rows) == len(set(s_rows)), "duplicate session emissions"
    assert s_rows == b_rows


def test_python_stream_source_restart_resumes_from_checkpoint(spark):
    """The events_replay Python source must honor the offset/commit
    contract across a restart: stop the query after the first
    committed batch, restart with the SAME checkpoint, drain, and the
    complete-mode aggregate must equal the batch result — proving the
    restarted query resumed from the committed offset (state restored,
    readBetweenOffsets replayed any uncommitted batch) instead of
    re-reading from row 0 and double-counting."""
    import ast
    import tempfile
    import time
    import uuid

    from universal_data_to_orc_converter_spark.sources.replay_stream import (
        EventsReplaySource,
    )

    spark.dataSource.register(EventsReplaySource)
    path = f"{SF_DIR}/events.parquet"
    total = spark.read.parquet(path).count()
    ckpt = tempfile.mkdtemp(prefix="ckpt_restart_")
    name = f"rp_{uuid.uuid4().hex[:8]}"

    def start():
        stream = (
            spark.readStream.format("events_replay")
            .option("path", path)
            .option("rows_per_batch", "2000")
            .load()
        )
        agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
        return (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    def end_row(q):
        p = q.lastProgress
        if not (p and p["sources"]):
            return 0
        end = p["sources"][0]["endOffset"]
        if isinstance(end, str):
            end = ast.literal_eval(end)
        return (end or {}).get("row", 0)

    q1 = start()
    deadline = time.time() + 60
    while end_row(q1) < 2000 and time.time() < deadline:
        time.sleep(0.2)
    assert end_row(q1) >= 2000, "first batch never committed"
    q1.stop()
    q1.awaitTermination(30)
    assert end_row(q1) < total, "stopped too late for a meaningful test"

    q2 = start()
    deadline = time.time() + 90
    while end_row(q2) < total and time.time() < deadline:
        time.sleep(0.2)
    q2.stop()
    q2.awaitTermination(30)

    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(
        map(
            tuple,
            load(spark, SF_DIR, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect(),
        )
    )
    assert got == want


def test_partitioned_python_stream_source_equals_batch(spark):
    """The partitioned (executor-parallel) Python stream reader must
    produce the same grouped counts as the batch table: the driver
    plans offset ranges, partitions() splits each micro-batch into 4
    InputPartitions, and executors deserialize only their slice —
    no row funnels through the driver, unlike the Simple reader."""
    from universal_data_to_orc_converter_spark.sources.replay_stream import (
        EventsReplayParSource,
        run_replay_until_drained,
    )

    spark.dataSource.register(EventsReplayParSource)
    path = f"{SF_DIR}/events.parquet"
    total = spark.read.parquet(path).count()
    stream = (
        spark.readStream.format("events_replay_par")
        .option("path", path)
        .option("rows_per_batch", "4000")
        .option("parts_per_batch", "4")
        .load()
    )
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n"))
    got = sorted(
        map(tuple, run_replay_until_drained(agg, total).collect())
    )
    want = sorted(
        map(
            tuple,
            load(spark, SF_DIR, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect(),
        )
    )
    assert got == want


def test_rocksdb_state_store_matches_default_provider(spark):
    """The production state backend for large streaming state (100 TB:
    keyed state no longer fits executor heaps — RocksDB spills to
    local disk with changelog checkpointing) must be a drop-in: the
    watermarked tumbling aggregation produces the IDENTICAL result
    under RocksDBStateStoreProvider as under the default HDFS-backed
    provider. Pins that the engine's streaming ops carry no
    provider-specific assumption."""
    import pyspark.sql.functions as F

    from universal_data_to_orc_converter_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
    )

    from .conftest import SF_DIR

    def run():
        stream = read_events_stream(spark, SF_DIR).withWatermark(
            "ts", "10 minutes"
        )
        agg = (
            stream.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .select(
                F.col("w.start").alias("ws"), "event_type", "n"
            )
        )
        return sorted(
            map(tuple, run_available_now(agg, output_mode="append").collect())
        )

    key = "spark.sql.streaming.stateStore.providerClass"
    default_rows = run()
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rocks_rows = run()
    finally:
        spark.conf.unset(key)
    assert rocks_rows == default_rows
    assert default_rows, "aggregation produced no rows; test is vacuous"


def test_dedup_within_watermark_state_plateaus(spark):
    """Live evidence for op_stream_dedup_within_watermark's
    bounded-state claim (r6 verdict #5): feed 6 micro-batches whose
    event times advance one hour per batch under a 30-minute
    watermark. dropDuplicatesWithinWatermark must (a) still emit every
    key exactly once, and (b) finish with FAR fewer state rows than
    total keys — the watermark evicted expired batches' keys — while
    plain dropDuplicates retains every key ever seen in state."""
    import shutil
    import time as _time

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    n_batches, keys_per_batch = 6, 100
    src = tempfile.mkdtemp(prefix="ddww_state_")
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )
    base = DT(2024, 1, 1, 0, 0, 0)
    now = _time.time()
    for b in range(n_batches):
        from datetime import timedelta

        rows = [
            (b * keys_per_batch + k, base + timedelta(hours=b))
            for k in range(keys_per_batch)
        ]
        path = os.path.join(src, f"batch_{b}.parquet")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
        # pin file-source batch order: one hour of mtime per batch
        for root, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                os.utime(p, (now - 3600 * (n_batches - b), ) * 2)
        os.utime(path, (now - 3600 * (n_batches - b), ) * 2)

    def run(dedup_fn):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*.parquet"))
            .withWatermark("ts", "30 minutes")
        )
        out = dedup_fn(stream).select("event_id")
        name = f"ddww_{dedup_fn.__name__}"
        ckpt = tempfile.mkdtemp(prefix="ckpt_ddww_")
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p["stateOperators"]
        ]
        got = sorted(r[0] for r in spark.table(name).collect())
        shutil.rmtree(ckpt, ignore_errors=True)
        return got, state_rows

    def within_watermark(s):
        return s.dropDuplicatesWithinWatermark(["event_id"])

    def plain(s):
        return s.dropDuplicates(["event_id"])

    total = n_batches * keys_per_batch
    got, state = run(within_watermark)
    assert got == list(range(total)), "a key was lost or duplicated"
    assert state, "no state-operator progress recorded"
    assert max(state) < total, (
        f"state never evicted: peak {max(state)} rows == total keys"
    )
    assert state[-1] <= 2 * keys_per_batch, (
        f"final state {state[-1]} rows — expected ~one live batch of "
        f"{keys_per_batch} keys after watermark eviction"
    )

    got_p, state_p = run(plain)
    assert got_p == list(range(total))
    assert state_p[-1] == total, (
        "plain dropDuplicates should retain every key in state — the "
        "caveat op_stream_dedup's notes document"
    )
    shutil.rmtree(src, ignore_errors=True)
