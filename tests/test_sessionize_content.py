"""Crafted-stream content tests for op_sessionize's gap semantics and
the CDC tombstone lifecycle — boundaries the fixture data may never
hit: a gap of exactly 1800 s (must NOT split — the rule is strictly
greater), one microsecond over (must split), and the
delete→re-upsert resurrection sequence."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.streaming.cdc import (
    cdc_upsert_batch,
)

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)


def _sessionize_rows(spark, events):
    """Run the registered op's logic on a crafted events view by
    swapping the catalog load for a temp fixture dir."""
    import os

    work = tempfile.mkdtemp(prefix="sess_fix_")
    df = spark.createDataFrame(
        events, "event_id long, ts timestamp, user_id long"
    ).withColumn("event_type", F.lit("view")).withColumn(
        "value", F.lit(0.0)
    ).withColumn("props", F.lit("{}"))
    df.coalesce(1).write.parquet(os.path.join(work, "events.parquet"))
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    out = load_all_queries()["op_sessionize"].fn(spark, work)
    return {
        (r.user_id, r.session_seq): (r.n_events, r.duration_us)
        for r in out.collect()
    }


def test_gap_boundary_exactly_30min_does_not_split(spark):
    rows = [
        (1, T0, 7),
        (2, T0 + dt.timedelta(seconds=1800), 7),           # == 1800s: same session
        (3, T0 + dt.timedelta(seconds=3600, microseconds=1), 7),  # >1800s: new
        (4, T0, 8),                                         # other user independent
    ]
    sess = _sessionize_rows(spark, rows)
    assert sess[(7, 1)] == (2, 1_800_000_000)
    assert sess[(7, 2)] == (1, 0)
    assert sess[(8, 1)] == (1, 0)


def test_same_timestamp_ties_stay_one_session(spark):
    rows = [(1, T0, 5), (2, T0, 5), (3, T0, 5)]
    sess = _sessionize_rows(spark, rows)
    assert sess == {(5, 1): (3, 0)}


def test_cdc_tombstone_shadow_and_resurrect(spark):
    """delete must shadow the older upsert; a LATER re-upsert must
    resurrect the key. Applied as three separate micro-batches in
    time order, then replay-checked."""
    target = tempfile.mkdtemp(prefix="cdc_life_") + "/tbl"
    cols = ("user_id", "ts", "event_id", "event_type", "value", "is_delete")
    schema = (
        "user_id long, ts timestamp, event_id long, "
        "event_type string, value double, is_delete boolean"
    )

    def batch(rows):
        return spark.createDataFrame(rows, schema)

    def snapshot():
        return {
            r.user_id: (r.ts, r.is_delete)
            for r in spark.read.parquet(target).collect()
        }

    t1, t2, t3 = (T0 + dt.timedelta(minutes=m) for m in (0, 1, 2))
    cdc_upsert_batch(
        spark, batch([(1, t1, 10, "v", 1.0, False)]), target, cols=cols
    )
    assert snapshot()[1] == (t1, False)

    # tombstone shadows the upsert (kept in the bucket, flagged)
    cdc_upsert_batch(
        spark, batch([(1, t2, 20, "d", 0.0, True)]), target, cols=cols
    )
    assert snapshot()[1] == (t2, True)

    # re-upsert resurrects
    cdc_upsert_batch(
        spark, batch([(1, t3, 30, "v", 2.0, False)]), target, cols=cols
    )
    assert snapshot()[1] == (t3, False)

    # replaying the tombstone batch out of order must NOT win over
    # the newer upsert (latest-write-wins is by ts, not arrival)
    cdc_upsert_batch(
        spark, batch([(1, t2, 20, "d", 0.0, True)]), target, cols=cols
    )
    assert snapshot()[1] == (t3, False)
