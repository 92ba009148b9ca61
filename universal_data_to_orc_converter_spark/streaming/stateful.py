"""Custom stateful streaming operator — applyInPandasWithState.

The escape hatch for streaming semantics the built-in operators can't
express (per-key custom state machines). Here: a per-user activity
accumulator maintaining event count, value sum (fixed-point exact) and
last-seen timestamp, with a processing-time timeout that would evict
idle users in a live stream — the canonical shape for per-entity
session state, fraud counters, rate limiters, etc.

State is one small tuple per key — executors hold |active users| ×
O(1) state no matter how many events stream through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def user_activity_stateful(events_stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, value_sum, last_seen) via
    applyInPandasWithState. Emits the updated state for every user
    touched in each micro-batch."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        n, vsum_fp, last = (
            state.get if state.exists else (0, 0, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            # fixed-point sum (see exprs.py) keeps the accumulation
            # exact and order-independent across micro-batches
            vsum_fp += int((pdf["value"] * 1_000_000 + 0.5).floordiv(1).sum())
            batch_max = pdf["ts"].max()
            last = batch_max if last is None or batch_max > last else last
        state.update((n, vsum_fp, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [vsum_fp / 1_000_000.0],
                "last_seen": [last],
            }
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, value_sum double, "
        "last_seen timestamp",
        stateStructType="n long, vsum_fp long, last timestamp",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_presence_with_timeout(
    events_stream: DataFrame, timeout_ms: int = 2000
) -> DataFrame:
    """Per-user presence tracker with ProcessingTimeTimeout eviction:
    active users accumulate counts; a user idle for ``timeout_ms`` is
    emitted once as 'evicted' and their state removed — the pattern
    for session cleanup, TTL caches, and abandoned-flow detection."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n,) = state.get if state.exists else (0,)
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "status": ["evicted"]}
            )
        else:
            (n,) = state.get if state.exists else (0,)
            for pdf in pdfs:
                n += len(pdf)
            state.update((n,))
            state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "status": ["active"]}
            )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, status string",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def user_activity_tws(events_stream: DataFrame) -> DataFrame:
    """The same per-user accumulator on Spark 4's transformWithState
    API (``transformWithStateInPandas``) — the successor to
    applyInPandasWithState: named state variables on a
    StatefulProcessor, explicit lifecycle, RocksDB-backed state.

    ENV LIMITATION: the TWS Python driver worker imports
    google.protobuf, which this container does not ship (pip installs
    are unavailable), so this path cannot execute here —
    tests/test_streaming.py::test_tws_stateful_matches_legacy_api
    importorskips on protobuf and will activate automatically in an
    environment that has it. It is deliberately NOT registered as a
    driver query (it would crash the harness); op_stream_stateful
    (applyInPandasWithState) is the executable stateful tier and
    shares the oracle this implementation would use.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserActivity(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState(
                "acc", "n long, vsum_fp long, last timestamp"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, vsum_fp, last = (
                self._acc.get() if self._acc.exists() else (0, 0, None)
            )
            for pdf in rows:
                n += len(pdf)
                vsum_fp += int(
                    (pdf["value"] * 1_000_000 + 0.5).floordiv(1).sum()
                )
                batch_max = pdf["ts"].max()
                last = (
                    batch_max if last is None or batch_max > last else last
                )
            self._acc.update((n, vsum_fp, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [vsum_fp / 1_000_000.0],
                    "last_seen": [last],
                }
            )

        def close(self) -> None:
            pass

    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivity(),
        outputStructType="user_id long, n_events long, value_sum double, "
        "last_seen timestamp",
        outputMode="Update",
        timeMode="None",
    )
