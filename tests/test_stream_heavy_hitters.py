"""op_stream_heavy_hitters — the streaming MG convergence contract:
the drained stream's top-10 must EQUAL the batch op bit-for-bit (both
are exact in the pinned regime), and per-batch summary writes must be
replay-idempotent."""

from __future__ import annotations

import glob
import os

from universal_data_to_orc_converter_spark.registry import load_all_queries

from .conftest import SF_SMOKE


def test_streamed_summaries_equal_batch_op(spark):
    qs = load_all_queries()
    stream_rows = [
        tuple(r)
        for r in qs["op_stream_heavy_hitters"].fn(spark, SF_SMOKE).collect()
    ]
    batch_rows = [
        tuple(r)
        for r in qs["op_heavy_hitters_maintain"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    assert len(stream_rows) == 10
    assert stream_rows == batch_rows
    # the three hot sentinels dominate by construction
    assert {k for k, _ in stream_rows[:3]} == {-1, -2, -3}


def test_summary_batch_write_is_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch_id must
    OVERWRITE its own prior summary, not add a second copy."""
    from universal_data_to_orc_converter_spark.streaming.heavy_hitters_stream import (
        mg_summary_batch,
    )

    df = spark.range(0, 1000).selectExpr("id AS event_id")
    store = str(tmp_path / "store")
    mg_summary_batch(df, store, 7, k=64)
    once = sorted(
        map(tuple, spark.read.parquet(os.path.join(store, "b_7")).collect())
    )
    mg_summary_batch(df, store, 7, k=64)  # replay
    twice = sorted(
        map(tuple, spark.read.parquet(os.path.join(store, "b_7")).collect())
    )
    assert once == twice
    assert glob.glob(os.path.join(store, "b_*")) == [
        os.path.join(store, "b_7")
    ]


def test_session_scratch_reclaims_on_demand(tmp_path):
    """The atexit-registered scratch registry: dirs exist during the
    session and targeted reclaim removes exactly the requested ones.
    Deliberately NOT reclaim_all() here (ADVICE r8): that would delete
    every registered dir, breaking any lazy frame or live streaming
    checkpoint an earlier test in this shared-session suite staged."""
    from universal_data_to_orc_converter_spark import scratch

    d1 = scratch.session_scratch("unittest_scr_")
    d2 = scratch.session_scratch("unittest_scr_")
    assert os.path.isdir(d1) and os.path.isdir(d2)
    before = list(scratch._REGISTERED)
    n = scratch.reclaim([d1, d2, str(tmp_path / "never_registered")])
    assert n == 2  # the unregistered path is ignored, not deleted
    assert not os.path.exists(d1) and not os.path.exists(d2)
    assert scratch._REGISTERED == [p for p in before if p not in (d1, d2)]


def test_streamed_quantiles_equal_batch_op(spark):
    """op_stream_quantiles convergence: the drained stream's served
    quantiles must EQUAL batch op_quantile_histogram_maintain's
    bit-for-bit (both fold the same hist_bins spec)."""
    qs = load_all_queries()
    stream_rows = sorted(
        tuple(r)
        for r in qs["op_stream_quantiles"].fn(spark, SF_SMOKE).collect()
    )
    batch_rows = sorted(
        tuple(r)
        for r in qs["op_quantile_histogram_maintain"]
        .fn(spark, SF_SMOKE)
        .collect()
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) >= 2  # several event types present
    for _typ, p50, p90, p99 in stream_rows:
        assert p50 <= p90 <= p99


def test_io_scratch_recreates_after_reclaim(spark):
    """Regression (review finding r8): io._scratch caches dirs by
    prefix; after reclamation the cached path is deleted AND
    unregistered, so returning it would hand out an unmanaged dir and
    silently reintroduce the leak. _scratch must detect the missing
    dir and mint a fresh registered one. Uses targeted reclaim, not
    reclaim_all(), to avoid nuking other tests' live scratch dirs."""
    import os

    from universal_data_to_orc_converter_spark import scratch
    from universal_data_to_orc_converter_spark.operators.io import _scratch

    first = _scratch("reclaim_regress_")
    assert os.path.isdir(first)
    assert _scratch("reclaim_regress_") == first  # cached reuse
    assert scratch.reclaim([first]) == 1
    assert not os.path.exists(first)
    second = _scratch("reclaim_regress_")
    assert second != first and os.path.isdir(second)
    assert second in scratch._REGISTERED  # managed again
