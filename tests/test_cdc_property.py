"""Property test: the CDC bucket merge converges to latest-per-key for
ANY partition of the change log into micro-batches, in ANY delivery
order — the invariant that makes the foreachBatch pipeline correct
under Spark's arbitrary file-to-batch assignment and checkpoint
replay, not just under the fixture's particular 4-way split."""

from __future__ import annotations

import datetime as dt
import tempfile


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from universal_data_to_orc_converter_spark.streaming.cdc import (
    cdc_upsert_batch,
)

T0 = dt.datetime(2025, 6, 1)

# a small change log: 24 versions over 6 keys, with ts collisions
ROWS = [
    (i, T0 + dt.timedelta(minutes=i % 7), 100 + i, "v", float(i))
    for i in range(24)
]
SCHEMA = (
    "user_id long, ts timestamp, event_id long, event_type string, "
    "value double"
)


def _expected():
    best = {}
    for uid, ts, eid, _t, val in ((r[0] % 6, r[1], r[2], r[3], r[4]) for r in ROWS):
        cur = best.get(uid)
        if cur is None or (ts, eid) > (cur[0], cur[1]):
            best[uid] = (ts, eid, val)
    return {k: v[2] for k, v in best.items()}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    assignment=st.lists(
        st.integers(min_value=0, max_value=2), min_size=24, max_size=24
    ),
    order=st.permutations([0, 1, 2]),
)
def test_any_batch_split_converges(spark, assignment, order):
    rows = [(r[0] % 6, r[1], r[2], r[3], r[4]) for r in ROWS]
    target = tempfile.mkdtemp(prefix="cdc_prop_") + "/tbl"
    for b in order:
        # empty batches are NOT skipped: checkpoint recovery can
        # redeliver an empty micro-batch and the merge must no-op on it
        batch = [r for r, a in zip(rows, assignment) if a == b]
        cdc_upsert_batch(
            spark,
            spark.createDataFrame(batch, SCHEMA),
            target,
        )
    got = {
        r.user_id: r.value
        for r in spark.read.parquet(target).collect()
    }
    assert got == _expected()
