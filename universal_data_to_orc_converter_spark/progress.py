"""Per-table conversion progress reporting.

The reference logs per-chunk progress while converting — e.g.
``Progress users: 500,000/10,458,327 rows`` (data_to_orc_converter.sh:249;
README.md:106-110 documents it as a feature) — because its pandas
loop owns a driver-side cursor. A Spark conversion is one distributed
write with no driver loop to hang a row counter on, so the honest
distributed analogs are:

* **in-flight**: task completion out of ``statusTracker()`` — a
  daemon thread polls the active stages under the write's job group
  and emits ``Progress <table>: K/N tasks`` lines whenever the count
  moves. Tasks, not rows: Spark cannot know the total row count
  before the scan finishes without paying a second pass, and at
  100 TB nobody should pay that pass for a log line.
* **per-table total**: an ``Observation`` (``df.observe``) riding the
  write plan counts rows *during* the single pass — exact, zero extra
  scan, and it works on any batch action. Emitted as
  ``<table>: 10,458,327 rows -> /out/users (2/14 tables)``.

``report=None`` (the default everywhere) keeps every conversion
silent and plan-identical — the hook adds an ``observe`` node only
when a callback is supplied.
"""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_with_progress"]

#: seconds between statusTracker polls while a table writes
_POLL_SEC = 0.5

#: how long to wait for the Observation result AFTER the write callback
#: returned. An action that materialized the observed plan resolves the
#: Observation as soon as the listener bus drains (normally well under a
#: second); the margin covers a congested bus. Tests shrink this.
_OBS_TIMEOUT_SEC = 15.0


def _observed_rows(obs: Observation, timeout: float):
    """``obs.get["rows"]`` with a timeout, or ``None`` if the observed
    plan was never materialized. ``Observation.get`` blocks forever in
    that case, so it is polled from a daemon helper thread — the only
    reliable way to distinguish "action ran, metrics coming" from "no
    action ever touched this frame" (r13 advice: inferring from
    job-group membership misfires both ways — an action on an
    UNRELATED frame passes, and a callback that sets its own job group
    internally fails spuriously)."""
    box: dict = {}

    def fetch() -> None:
        box["rows"] = obs.get["rows"]

    t = threading.Thread(target=fetch, daemon=True)
    t.start()
    t.join(timeout)
    return box.get("rows")


def _poll_tasks(
    spark: SparkSession,
    say: Callable[[str], None],
    name: str,
    group: str,
    stop: threading.Event,
) -> None:
    # scoped to the write's own job group so concurrent table
    # conversions (Spark schedules them freely — op_parallel_tables)
    # never mix their task counts into each other's narration
    tracker = spark.sparkContext.statusTracker()
    last = -1
    while not stop.wait(_POLL_SEC):
        try:
            done = total = 0
            for jid in tracker.getJobIdsForGroup(group):
                job = tracker.getJobInfo(jid)
                if job is None:
                    continue
                for sid in job.stageIds:
                    info = tracker.getStageInfo(sid)
                    if info is not None:
                        done += info.numCompletedTasks
                        total += info.numTasks
        except Exception:  # tracker races with job teardown — benign
            continue
        if total and done != last:
            last = done
            say(f"Progress {name}: {done}/{total} tasks")


def write_with_progress(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    index: int,
    total_tables: int,
    report: Callable[[str], None] | None,
    write: Callable[[DataFrame], None],
) -> None:
    """Run ``write(df)``, narrating per-table progress via ``report``.

    With ``report=None`` this is exactly ``write(df)`` — no observe
    node, no poller thread, byte-identical plan.

    Contract: ``write`` MUST execute at least one action on the frame
    it is handed — the row total comes from an ``Observation`` riding
    that action, and ``Observation.get`` blocks until some action
    materializes the observed plan. A ``write`` that never acts (or
    acts only on some OTHER frame) would hang here; the guard polls
    the Observation itself with a timeout and converts that
    programming error into a ValueError instead (r12 advice; made
    robust per r13 advice — the old job-group-membership inference
    passed on unrelated-frame actions and failed spuriously on
    callbacks that set their own job group).
    """
    if report is None:
        write(df)
        return
    obs = Observation(f"convert_{name}_{index}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    report(f"Converting {name} ({index}/{total_tables}) ...")
    sc = spark.sparkContext
    group = f"convert_{name}_{index}"
    # save the CALLER's job group (thread-local) so a caller that wraps
    # multi-table conversions in its own group gets it back, instead of
    # the old unconditional clear wiping it after the first table
    # (r12 advice)
    prev_group = sc.getLocalProperty("spark.jobGroup.id")
    prev_desc = sc.getLocalProperty("spark.job.description")
    stop = threading.Event()
    poller = threading.Thread(
        target=_poll_tasks,
        args=(spark, report, name, group, stop),
        daemon=True,
    )
    poller.start()
    sc.setJobGroup(group, f"convert {name} -> ORC")
    try:
        write(observed)
    finally:
        sc.setJobGroup(prev_group, prev_desc)
        stop.set()
        poller.join(timeout=5)
    rows = _observed_rows(obs, _OBS_TIMEOUT_SEC)
    if rows is None:
        raise ValueError(
            f"write callback for table {name!r} ran no Spark action on "
            "the frame it was handed; the observed row total would "
            "block forever"
        )
    report(f"{name}: {rows:,} rows written ({index}/{total_tables} tables)")
